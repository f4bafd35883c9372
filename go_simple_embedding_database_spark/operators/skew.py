"""Skew mitigation — salting for hot keys, the hand-rolled complement to
AQE's runtime skew-join splitting.

At 100 TB a handful of hot keys (empty-ish documents sharing a content
hash, boilerplate LSH buckets, a celebrity user_id in events) can pin a
whole stage on one task. Two standard remedies, as reusable operators:

- ``salted_aggregate``: two-phase aggregation — stage 1 aggregates on
  (key, salt) spreading a hot key over N tasks, stage 2 merges the N
  partials per key. Correct for any algebraic aggregate expressed as
  (partial, merge) column pairs.
- ``salted_broadcast_left``: for a join where the LEFT side has hot keys
  and the right side is broadcastable, salting is unnecessary (broadcast
  joins don't shuffle the left side at all) — provided as the decision
  helper it is: the first fix for a skewed join is to not shuffle.
- ``replicated_skew_join``: full shuffle-join remedy when NEITHER side
  broadcasts — salt the skewed left side, replicate the right side once
  per salt, equi-join on (key, salt). Costs |R|·salts rows of shuffle for
  the replicated side; use only for keys detected hot.

AQE (enabled in session.py) already splits skewed SORT-MERGE join
partitions at runtime; these operators cover the aggregation case and the
planned-ahead case where the skew is known (and measurable via
``key_histogram``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_balance(df: DataFrame, keys: list[str] | None = None,
                      num_partitions: int = 256) -> dict:
    """Straggler canary — the local[N] stand-in for the task-metrics check
    a real cluster gives: hash-partition ``df`` on ``keys`` at a forced-
    high partition count (or, with ``keys=None``, measure the input
    splits as-is) and report the per-partition row-count balance.
    ``max_over_mean > 2`` means one task would read more than twice the
    mean input at scale — salt the key, widen the bucketing, or rely on
    AQE skew splitting, but don't ship the plan unmeasured. The mean is
    over NON-EMPTY partitions: at 100 TB every partition is occupied, so
    empty local partitions are a small-data artifact, not balance.

    Pick ``num_partitions`` so the mean stays ≳50 rows/partition
    (``suggest_partitions``): below that, Poisson placement noise alone
    exceeds the 2x threshold and the canary measures sampling, not skew."""
    if keys:
        df = df.repartition(num_partitions, *[F.col(k) for k in keys])
    sizes = (df.select(F.spark_partition_id().alias("_p"))
             .groupBy("_p").agg(F.count("*").alias("n")).collect())
    counts = [r.n for r in sizes]
    if not counts:  # empty input: report explicitly, don't crash the canary
        return {"partitions_nonempty": 0, "max_rows": 0,
                "mean_rows": 0.0, "max_over_mean": 0.0}
    mx, mean = max(counts), sum(counts) / len(counts)
    return {
        "partitions_nonempty": len(counts),
        "max_rows": mx,
        "mean_rows": round(mean, 1),
        "max_over_mean": round(mx / mean, 3),
    }


def suggest_partitions(n_rows: int, min_mean: int = 64,
                       lo: int = 16, hi: int = 1024) -> int:
    """Partition count for ``partition_balance`` that keeps the mean
    occupancy ≥ ``min_mean`` rows so the 2x straggler threshold measures
    key skew, not Poisson placement noise."""
    return max(lo, min(hi, n_rows // min_mean))


def key_histogram(df: DataFrame, key_col: str, top: int = 20) -> DataFrame:
    """Per-key row counts, heaviest first — the skew detector. Run this on
    a sample (or the full table, it is one map-side-combined aggregation)
    before choosing a join/agg strategy."""
    return (df.groupBy(key_col).agg(F.count("*").alias("n_rows"))
            .orderBy(F.desc("n_rows")).limit(top))


def with_salt(df: DataFrame, salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, salts). Random (not hash-of-key!) — the
    whole point is that identical keys get DIFFERENT salts."""
    return df.withColumn(salt_col, (F.rand(seed=42) * salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``partial_aggs``: name -> aggregate Column for phase 1 (over (key, salt)).
    ``merge_aggs``:   name -> aggregate Column for phase 2 (over key),
    referencing the phase-1 names. Example for count+sum::

        salted_aggregate(df, "k",
            {"n": F.count("*"), "s": F.sum("v")},
            {"n": F.sum("n"), "s": F.sum("s")})

    Phase 1 spreads each hot key over ``salts`` tasks; phase 2 shuffles
    only ``salts`` rows per key. (Spark's own hash aggregation already
    does map-side partials — salting additionally bounds the REDUCE-side
    task for a key at 1/salts of its rows, which partials alone cannot.)
    """
    salted = with_salt(df, salts)
    phase1 = salted.groupBy(key_col, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()])
    return phase1.groupBy(key_col).agg(
        *[c.alias(n) for n, c in merge_aggs.items()])


def replicated_skew_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with a salted left side and a salts-times replicated
    right side: every (key, salt) bucket holds 1/salts of a hot key's left
    rows and one full copy of its right rows. Exact same result as
    ``left.join(right, key_col)`` for 1:N joins; shuffle cost on the right
    grows by ×salts — apply only when the right side is the small-but-not-
    broadcastable one.

    Left-favored joins only: under right/full outer semantics every
    replicated-but-unmatched right copy would survive as its own
    null-padded output row (salts× duplicates) — rejected loudly."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"replicated_skew_join supports inner/left/left_semi/left_anti, "
            f"got {how!r}: replicated right rows would duplicate under "
            f"right/full outer semantics")
    lsalted = with_salt(left, salts)
    explode_salt = F.explode(F.sequence(F.lit(0), F.lit(salts - 1))).alias("_salt")
    rrepl = right.select("*", explode_salt)
    out = lsalted.join(rrepl, [key_col, "_salt"], how)
    return out.drop("_salt")
