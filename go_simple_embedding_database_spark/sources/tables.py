"""Parquet table loaders for the driver-generated testdata layout.

At scale these would be catalog tables (Hive/Unity/Glue) over partitioned
Parquet/Delta; filters and column pruning push into the scan either way —
tests assert PushedFilters/ReadSchema via ``plans.explain_utils``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long (nanosAsLong) → truncate to micros,
        # DuckDB's native timestamp precision, so oracles agree exactly.
        # Integer `div`, NOT `/`: double division loses ulp-level precision
        # at ~1.7e15 µs and rounds the microsecond.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
