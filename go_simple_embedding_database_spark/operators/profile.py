"""One-pass table profiling — the ingest-audit step of a 100 TB pipeline.

Before a corpus enters training, every batch gets a data-quality profile:
per column, the null fraction, cardinality, and value range. The naive
formulation is one query per column per statistic — k scans of a table
that is expensive to scan once. The PRODUCTION shape here
(``exact_control=False``) computes every column's statistics in ONE
aggregation over ONE scan (plan-asserted single parquet scan):
count / null count / HLL++ cardinality sketch / min / max per column,
then explodes the 1-row result into the long (column, statistic...)
format downstream audit rules consume.

Cardinality ships twice at gate SF, deliberately (the
approx_distinct_users pattern): ``approx_count_distinct`` (HLL++:
mergeable, constant memory) is the 100 TB path; exact ``countDistinct``
is the small-SF control the verdict column compares it against. The
control runs as its OWN aggregation pass, combined by a broadcast join
of the two 1-row aggregates — NOT fused into the sketch pass — because Catalyst's distinct-aggregate
rewrite (Expand) combined with a TypedImperativeAggregate (the HLL++
buffer) degenerates to a SortAggregate that drags the serialized sketch
buffers through the expanded row stream: the fused formulation measured
77 s at sf0.1 where the two-pass split runs in ~2 s. The control pass is
also where the Expand lives — production profiling drops it and keeps
the single-scan sketch pass.

No counterpart in the reference (SURVEY.md §2 extensions): the 544-LoC
surface has no table statistics of any kind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str] | None = None,
                  rsd: float = 0.02, exact_control: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all). Returns one row per column:
    (column, n_rows, n_nulls, null_frac, n_distinct,
    distinct_within_10pct, min_value, max_value).

    - ``null_frac`` is rounded to 6 decimals (cross-engine hashable);
    - with ``exact_control=True`` (gate shape), ``n_distinct`` is the
      EXACT distinct count from the separate control pass and
      ``distinct_within_10pct`` = 1 iff the HLL++ estimate at ``rsd``
      lands within 10% of it — NULL-proof: an all-NULL column has
      n_distinct = 0 and the verdict is a definite 0 on both engines;
    - with ``exact_control=False`` (production shape: ONE scan, no
      Expand), ``n_distinct`` carries the HLL++ ESTIMATE and
      ``distinct_within_10pct`` is NULL;
    - ``min_value``/``max_value`` are cast to string so one long-format
      schema carries every column type; callers with double columns
      should pre-round/pre-cast in the projection they pass in (engine
      float-to-string formatting is not a cross-engine contract).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"_na_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    if exact_control:
        # Separate pass ON PURPOSE — see the module docstring. Both
        # sides are global aggregates (exactly one row each), so the
        # combine is a broadcast nested loop of a PROVABLY 1-row build
        # side — the one place that join is the right plan (a literal
        # join key would constant-fold back to this anyway).
        control = df.agg(*[F.countDistinct(F.col(c)).alias(f"_nd_{c}")
                           for c in cols])
        one = one.crossJoin(F.broadcast(control))

    def entry(c: str):
        n_exact = F.col(f"_nd_{c}") if exact_control else F.lit(None)
        verdict = (
            ((n_exact > 0)
             & (F.abs(F.col(f"_na_{c}") - n_exact) / n_exact <= 0.10))
            .cast("int") if exact_control else F.lit(None).cast("int"))
        return F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.when(F.col("_n") > 0,
                   F.round((F.col("_n") - F.col(f"_nn_{c}")) / F.col("_n"),
                           6)).alias("null_frac"),
            (F.col(f"_nd_{c}") if exact_control
             else F.col(f"_na_{c}")).alias("n_distinct"),
            verdict.alias("distinct_within_10pct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"))

    return (one.select(F.explode(F.array(*[entry(c) for c in cols]))
                       .alias("_p"))
            .select("_p.*"))


def table_profile_sql(table: str, columns: list[str],
                      exprs: dict[str, str] | None = None) -> str:
    """DuckDB twin of :func:`table_profile` (exact control shape): one
    UNION ALL branch per column — the naive k-scan formulation the
    operator is equivalent to (and exists to avoid). ``exprs`` maps a
    column name to the projection expression the Spark side profiled
    (e.g. a pre-rounded integer-cents expression for double columns)."""
    exprs = exprs or {}
    parts = []
    for c in columns:
        e = exprs.get(c, c)
        parts.append(f"""
SELECT '{c}' AS column, count(*) AS n_rows,
       count(*) - count({e}) AS n_nulls,
       CASE WHEN count(*) > 0
            THEN round((count(*) - count({e})) / CAST(count(*) AS DOUBLE), 6)
       END AS null_frac,
       count(DISTINCT {e}) AS n_distinct,
       CAST(count(DISTINCT {e}) > 0 AS INT) AS distinct_within_10pct,
       CAST(min({e}) AS VARCHAR) AS min_value,
       CAST(max({e}) AS VARCHAR) AS max_value
FROM {table}""")
    return "\nUNION ALL\n".join(parts)
