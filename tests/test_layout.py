"""Z-order layout (operators/layout.py)."""

import duckdb
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.layout import (
    write_zordered,
    zorder_value,
    zorder_value_sql,
)


def _morton2(u: int, d: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((u >> b) & 1) << (2 * b)
        z |= ((d >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_value_matches_reference_bits(spark):
    rows = [(0b1010, 0b0110), (0, 0), (255, 255), (1, 128)]
    df = spark.createDataFrame(rows, "u int, d int")
    got = {(r.u, r.d): r.z for r in
           df.select("u", "d",
                     zorder_value([F.col("u"), F.col("d")], 8).alias("z"))
           .collect()}
    for u, d in rows:
        assert got[(u, d)] == _morton2(u, d), (u, d)


def test_zorder_sql_twin_matches(spark):
    con = duckdb.connect()
    expr = zorder_value_sql(["u", "d"], 8)
    duck = con.sql(
        f"SELECT u, d, {expr} AS z FROM "
        f"(SELECT unnest(range(0, 64)) AS u, 17 AS d)").fetchall()
    for u, d, z in duck:
        assert z == _morton2(u, d)


def test_bucket_rectangles_bounded(spark):
    """Dropping the low 8 z-bits fixes bits 4..7 of BOTH coordinates, so
    every bucket spans at most 16 consecutive values of each column —
    the exact locality bound file min/max pruning relies on."""
    grid = spark.range(0, 4096).select(
        (F.col("id") % 256).cast("int").alias("u"),
        (F.col("id") / 256).cast("int").alias("d"))
    z = zorder_value([F.col("u"), F.col("d")], 8)
    spans = (grid.withColumn("bucket", F.shiftright(z, 8))
             .groupBy("bucket")
             .agg((F.max("u") - F.min("u")).alias("du"),
                  (F.max("d") - F.min("d")).alias("dd")).collect())
    assert spans
    assert all(r.du <= 15 and r.dd <= 15 for r in spans)


def _mean_spans(spark, path):
    rows = (spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg((F.max("u") - F.min("u")).alias("du"),
                 (F.max("d") - F.min("d")).alias("dd")).collect())
    assert len(rows) >= 8
    return (sum(r.du for r in rows) / len(rows),
            sum(r.dd for r in rows) / len(rows))


def test_write_zordered_bounds_both_columns(spark, tmp_path):
    """The pruning claim, measured: per-file min/max footer stats must
    bound BOTH interleaved columns to a fraction of their global range.
    A single-column sort bounds only its own column — the secondary
    column spans ~the whole range in every file, so filters on it read
    everything. (A few z-ranges straddle a high-bit transition and span
    one full axis — hence MEAN span, not max.)"""
    n = 256 * 64
    grid = spark.range(0, n).select(
        (F.col("id") % 256).cast("int").alias("u"),
        ((F.col("id") / 256).cast("int") * 4).alias("d"))  # d in [0, 252]

    zpath = str(tmp_path / "zordered")
    write_zordered(grid, zpath,
                   zorder_value([F.col("u"), F.col("d")], 8), num_files=16)
    zu, zd = _mean_spans(spark, zpath)
    assert zu <= 0.6 * 255 and zd <= 0.6 * 252, (zu, zd)

    upath = str(tmp_path / "usorted")  # the baseline z-order replaces
    (grid.repartitionByRange(16, "u").sortWithinPartitions("u")
     .write.parquet(upath))
    su, sd = _mean_spans(spark, upath)
    assert sd >= 0.9 * 252  # u-sort leaves d unbounded per file
    assert zd < 0.5 * sd    # z-order's d-pruning beats it decisively
