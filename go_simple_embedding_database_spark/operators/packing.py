"""Sequence packing — concat-and-chunk assignment of documents into
fixed-capacity training sequences.

LLM pre-training consumes fixed-length token sequences; short documents
are concatenated (with separators) and the stream is cut every
``capacity`` tokens. The expensive part at 100 TB is not the concat — it
is computing, for every document, WHERE in the token stream it starts,
which is a running sum over an ordered corpus.

Scale design: a single global running sum is a one-partition window — the
canonical scale-killer. Real pipelines never need a globally ordered
stream: packing happens independently per shard (here ``partition_cols``,
e.g. source, or source × date), so the window partitions by the shard key
and every shard's cumsum runs in parallel. Within a shard the order is
total (``order_col`` must be unique per shard) so the assignment is
deterministic and oracle-checkable. The reference has no notion of
packing (its records are embedded whole, records/records.go:81-92); this
is pure pipeline extension surface.

Everything is window + arithmetic: whole-stage codegen, one shuffle on
the shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.text import token_count


def assign_pack_bins(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    capacity: int = 2048,
    partition_cols: list[str] | None = None,
    sep_tokens: int = 1,
) -> DataFrame:
    """Add packing columns to ``df``:

    - ``n_tokens``: BPE-ish token count of ``text_col`` plus
      ``sep_tokens`` for the document separator (every doc pays the
      separator, mirroring an EOS appended per document);
    - ``start_token``: offset of the document's first token in its
      shard's concatenated stream (cumsum of preceding docs);
    - ``bin``: index of the capacity-sized sequence the document STARTS
      in (``start_token // capacity``). A long document may spill into
      later bins; ``spans_bins`` counts how many sequences it touches.

    Deterministic: shard order is (order_col) total within each shard.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(order_col)
    n_tok = (token_count(F.col(text_col)) + F.lit(sep_tokens)).cast("bigint")
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "start_token",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(
                    Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn("bin", (F.col("start_token") / capacity).cast("bigint"))
    )
    end_incl = F.col("start_token") + F.col("n_tokens") - 1
    return out.withColumn(
        "spans_bins",
        ((end_incl / capacity).cast("bigint") - F.col("bin") + 1),
    )


def pack_summary(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    capacity: int = 2048,
    partition_cols: list[str] | None = None,
    sep_tokens: int = 1,
) -> DataFrame:
    """Per-(shard, bin) packing stats: how many documents start in each
    sequence, their token mass, and the id range — the shape a packing
    job's writer consumes (one output row group per bin). Aggregation
    keys extend the window's partition key, so Catalyst reuses the same
    hash partitioning: one shuffle total."""
    parts = partition_cols or []
    binned = assign_pack_bins(df, text_col, order_col, capacity, parts,
                              sep_tokens)
    return (
        binned.groupBy(*parts, "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )


def pack_summary_sql(
    table: str,
    text_expr: str = "text",
    order_col: str = "doc_id",
    capacity: int = 2048,
    partition_cols: list[str] | None = None,
    sep_tokens: int = 1,
) -> str:
    """DuckDB twin of ``pack_summary`` (same window + arithmetic).

    The output SUM is cast to BIGINT: DuckDB's ``sum(BIGINT)`` yields
    HUGEINT (int128), a type whose client-side conversion varies across
    DuckDB versions (int vs float64 in pandas) — an exposed HUGEINT
    column is the one thing that can flip an otherwise-identical result's
    value hash between environments. Repo rule: no HUGEINT/DECIMAL
    output columns in any oracle (pinned by tests/test_oracle_types.py).
    """
    from go_simple_embedding_database_spark.functions.text import token_count_sql

    parts = partition_cols or []
    pcols = ", ".join(parts)
    pby = f"PARTITION BY {pcols} " if parts else ""
    psel = f"{pcols}, " if parts else ""
    return f"""
WITH toks AS (
  SELECT {psel}{order_col},
         CAST({token_count_sql(text_expr)} + {sep_tokens} AS BIGINT) AS n_tokens
  FROM {table}
),
offs AS (
  SELECT *,
         CAST(COALESCE(SUM(n_tokens) OVER ({pby}ORDER BY {order_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_token
  FROM toks
)
SELECT {psel}CAST(start_token // {capacity} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN({order_col}) AS first_doc,
       MAX({order_col}) AS last_doc
FROM offs
GROUP BY {psel}bin
"""
