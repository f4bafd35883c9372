"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join.

The reference has no joins at all (SURVEY §2.6 — closest relative is the
1xN similarity scan, /root/reference/collection/collection.go:88-94);
these extend the engine toward the time-series side of training-data
pipelines (event attribution, nearest-context lookup).

Scale design:
- ``asof_join`` is the union + window formulation: ONE shuffle on the
  equality keys, then a running ``last(..., ignorenulls)`` over the
  interleaved timeline. No range predicate ever reaches a join — the
  planner can't turn a theta join into anything better than a
  broadcast-nested-loop, which dies at scale; this stays a hash
  exchange + in-partition sort whatever the row count.
- ``range_join`` banding: each right row lands in fixed-width time
  buckets, left probes its own bucket ± 1 — an equi-join on
  (keys, bucket), never a cross product. Per-task work is bounded by
  bucket population, not table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts_col: str = "ts", payload_cols: list[str] | None = None,
              direction: str = "backward", inclusive: bool = True,
              suffix: str = "_right") -> DataFrame:
    """For every left row, attach the payload of the single right row with
    the greatest ``ts`` <= left.ts (direction='backward') or the smallest
    ``ts`` >= left.ts ('forward'), matching on ``keys``. Left rows with no
    match keep null payload (left-join semantics).

    Implementation: tag and union both sides, window-partition by keys,
    order by (ts, tag) so the eligible right row is the running
    ``last(payload, ignorenulls)`` (backward) / ``first`` over the
    following frame (forward) at each left row. ``inclusive`` controls
    whether a right row at exactly left.ts is eligible (tag ordering puts
    it before or after the left row).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in keys and c != ts_col]
    pay = F.struct(*[F.col(c) for c in payload_cols])
    pay_type = right.select(pay.alias("_p")).schema["_p"].dataType

    # Tag ordering at equal ts decides inclusivity. backward+inclusive:
    # right first (so last() sees it); forward+inclusive: right after left
    # (so first() over the following frame sees it).
    right_first = (direction == "backward") == inclusive
    r_tag, l_tag = (0, 1) if right_first else (1, 0)

    l = left.select(
        *[F.col(k) for k in keys], F.col(ts_col).alias("_ts"),
        F.lit(l_tag).alias("_tag"), F.lit(None).cast(pay_type).alias("_pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"))
    r = right.select(
        *[F.col(k) for k in keys], F.col(ts_col).alias("_ts"),
        F.lit(r_tag).alias("_tag"), pay.alias("_pay"),
        F.lit(None).cast(l.schema["_row"].dataType).alias("_row"))

    w = Window.partitionBy(*keys).orderBy("_ts", "_tag")
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        match = F.last("_pay", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        match = F.first("_pay", ignorenulls=True).over(w)

    out = (l.unionByName(r)
           .withColumn("_match", match)
           .filter(F.col("_row").isNotNull()))
    cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_match.{c}").alias(f"{c}{suffix}" if c in left.columns else c)
             for c in payload_cols]
    return out.select(*cols)


def range_join(left: DataFrame, right: DataFrame, keys: list[str],
               ts_col: str = "ts", lower: str = "5 minutes",
               upper: str = "5 minutes", suffix: str = "_right") -> DataFrame:
    """All (left, right) pairs with right.ts in
    [left.ts - lower, left.ts + upper], equi-matched on ``keys``.

    Banding: right rows bucket by floor(ts / width); each left row probes
    the buckets its interval can touch (the interval spans at most
    ceil(span/width)+1 buckets since width >= span). The join is pure
    equi-join on (keys, bucket) — shuffle-partitionable, no theta join —
    and the exact BETWEEN predicate filters inside the bucket match.
    """
    low_s = _interval_seconds(lower)
    up_s = _interval_seconds(upper)
    width = max(low_s + up_s, 1)

    r_ts = _epoch_seconds(right, ts_col)
    rb = right.select(
        *[F.col(c).alias(f"{c}{suffix}" if c in left.columns else c)
          for c in right.columns],
        (r_ts / width).cast("long").alias("_bucket"),
        r_ts.alias("_rts"))
    l_ts = _epoch_seconds(left, ts_col)
    lo_bucket = ((l_ts - low_s) / width).cast("long")
    hi_bucket = ((l_ts + up_s) / width).cast("long")
    lb = left.select(
        "*", l_ts.alias("_lts"),
        F.explode(F.sequence(lo_bucket, hi_bucket)).alias("_bucket"))

    cond = lb["_bucket"] == rb["_bucket"]
    for k in keys:
        rk = f"{k}{suffix}" if f"{k}{suffix}" in rb.columns else k
        cond &= lb[k] == rb[rk]
    range_cond = (F.col("_rts") >= F.col("_lts") - low_s) & \
                 (F.col("_rts") <= F.col("_lts") + up_s)
    out = lb.join(rb, cond).filter(range_cond)
    drop = ["_bucket", "_lts", "_rts"] + [
        f"{k}{suffix}" for k in keys if f"{k}{suffix}" in rb.columns]
    return out.drop(*drop)


def _epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Numeric seconds for bucketing. TIMESTAMP_NTZ (parquet timestamp
    without tz) and DATE can't cast straight to double — route them
    through TIMESTAMP first; both sides of the join use the same
    conversion so the banding stays consistent."""
    dt = df.schema[ts_col].dataType.typeName()
    c = F.col(ts_col)
    if dt in ("timestamp_ntz", "date"):
        c = c.cast("timestamp")
    return c.cast("double")


def _interval_seconds(spec: str) -> int:
    """'5 minutes' / '30 seconds' / '2 hours' / '1 day' -> seconds."""
    n, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult
