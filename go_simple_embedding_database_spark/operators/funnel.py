"""Ordered-funnel and cohort-retention analytics over event streams.

Both are per-entity sequential computations that reduce to one shuffle on
the entity key (user_id):

- ``funnel_times``: earliest time each user completed each funnel stage
  IN ORDER (stage k counts only after stage k-1's completion time). The
  chained ``min(ts) > previous_stage_ts`` conditions compose as stacked
  window aggregates over the SAME partition key, so Catalyst plans one
  exchange and evaluates every stage in a single window stage.
- ``funnel_counts``: the funnel report — users reaching each stage.
- ``cohort_retention``: users bucketed by first-activity period; for
  each (cohort, periods-since) cell, how many distinct users were
  active — the standard retention triangle.

Scale notes: per-user state is O(#stages) columns, never a collected
list; the distinct-user counts are hash aggregates. Skewed hot users
cost one window partition each (bounded by that user's events — use
``operators.skew`` if a single user's event count rivals a partition).
The reference has no event/temporal surface (SURVEY §2.6); this is
pipeline-extension surface shared with events_sessionize/events_asof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user with ``<stage>_ts`` columns: the earliest event
    of each stage type occurring AFTER the previous stage's earliest
    qualifying time (strictly ordered funnel). A stage a user never
    reaches (or reaches only out of order) is null, and so are all later
    stages."""
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(user_col)
    out = events
    prev: Column | None = None
    for stage in stages:
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        col_name = f"{stage}_ts"
        out = out.withColumn(
            col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(col_name)
    agg = [F.first(f"{s}_ts").alias(f"{s}_ts") for s in stages]
    return out.groupBy(user_col).agg(*agg)


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel report: (stage_idx, stage, n_users) — users whose
    ordered funnel reached each stage. Monotonically non-increasing by
    construction."""
    times = funnel_times(events, stages, user_col, ts_col, type_col)
    counts = times.agg(*[
        F.count(f"{s}_ts").alias(s) for s in stages
    ])
    stage_structs = F.array(*[
        F.struct(F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"),
                 F.col(s).alias("n_users"))
        for i, s in enumerate(stages)
    ])
    return (
        counts.select(F.explode(stage_structs).alias("r"))
        .select("r.stage_idx", "r.stage", "r.n_users")
    )


def funnel_counts_sql(
    table: str,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of ``funnel_counts``: identical chained window
    formulation, stages unpivoted via UNION ALL."""
    stage_exprs = []
    prev = None
    for stage in stages:
        cond = f"{type_col} = '{stage}'"
        if prev is not None:
            cond += f" AND {ts_col} > {prev}"
        stage_exprs.append(
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) "
            f"OVER (PARTITION BY {user_col}) AS {stage}_ts")
        prev = f"{stage}_ts"
    # DuckDB window aliases aren't referencable in the same SELECT —
    # chain one CTE per stage instead.
    ctes, src = [], table
    for i, e in enumerate(stage_exprs):
        ctes.append(f"s{i} AS (SELECT *, {e} FROM {src})")
        src = f"s{i}"
    per_user = (
        f"u AS (SELECT {user_col}, "
        + ", ".join(f"MIN({s}_ts) AS {s}_ts" for s in stages)
        + f" FROM {src} GROUP BY {user_col})"
    )
    selects = [
        f"SELECT {i} AS stage_idx, '{s}' AS stage, COUNT({s}_ts) AS n_users FROM u"
        for i, s in enumerate(stages)
    ]
    return ("WITH " + ",\n".join(ctes + [per_user]) + "\n"
            + "\nUNION ALL\n".join(selects))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Retention triangle: cohort = each user's first activity date
    truncated to a ``period_days`` grid anchored at the corpus-wide
    minimum date; cell value = distinct users of that cohort active
    ``periods_since`` periods later. Day arithmetic (datediff // N)
    rather than calendar truncation keeps the bucketing engine-agnostic.

    Two shuffles: the per-user first-date window (user key) and the
    (cohort, periods_since) count-distinct — the distinct re-shuffles by
    user anyway, so the pipeline is shuffle-minimal for an exact count.
    """
    w = Window.partitionBy(user_col)
    d = F.to_date(ts_col)
    with_first = events.select(
        F.col(user_col), d.alias("_d")
    ).withColumn("_first", F.min("_d").over(w))
    # Corpus-wide anchor as a broadcast 1-row aggregate, NOT a global
    # window (an empty partitionBy() funnels every row into one task).
    anchor_df = events.select(d.alias("_d")).agg(F.min("_d").alias("_anchor"))
    graded = with_first.crossJoin(F.broadcast(anchor_df)).withColumn(
        "cohort",
        (F.datediff(F.col("_first"), F.col("_anchor")) / period_days)
        .cast("bigint"),
    ).withColumn(
        "periods_since",
        (F.datediff(F.col("_d"), F.col("_first")) / period_days).cast("bigint"),
    )
    return (
        graded.groupBy("cohort", "periods_since")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def cohort_retention_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> str:
    """DuckDB twin of ``cohort_retention``."""
    return f"""
WITH d AS (
  SELECT {user_col},
         CAST({ts_col} AS DATE) AS _d,
         MIN(CAST({ts_col} AS DATE)) OVER (PARTITION BY {user_col}) AS _first,
         MIN(CAST({ts_col} AS DATE)) OVER () AS _anchor
  FROM {table}
)
SELECT CAST(datediff('day', _anchor, _first) // {period_days} AS BIGINT) AS cohort,
       CAST(datediff('day', _first, _d) // {period_days} AS BIGINT) AS periods_since,
       COUNT(DISTINCT {user_col}) AS n_users
FROM d
GROUP BY 1, 2
"""
