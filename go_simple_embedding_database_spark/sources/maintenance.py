"""Table maintenance — small-file compaction.

Streaming ingest (one file per micro-batch per partition) and incremental
appends accumulate small files; at 100 TB the file-listing and per-file
open costs come to dominate scans long before data volume does. Compaction
rewrites a parquet table into size-targeted files. (Delta/Iceberg do this
transactionally as OPTIMIZE; plain parquet gets the rewrite-and-swap
below: write to a temp dir, then atomically move — here exposed as
write-to-new-path so the caller controls the swap.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # the classic HDFS-block-ish target


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE-style upsert as a relational expression: every update row
    wins; base rows survive only if their key is absent from the updates
    (left-anti join on the keys — one shuffle, no driver loop). This is
    the plan Delta/Iceberg MERGE executes under the hood; on plain parquet
    the caller writes the result as the new table version. Both inputs
    must share a schema (unionByName enforces it)."""
    return updates.unionByName(
        base.join(updates.select(*keys), keys, "left_anti"))


def estimate_table_bytes(spark: SparkSession, path: str) -> int:
    """Sum of file sizes via the filesystem listing (no data read)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(hadoop_path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += f.getLen()
    return total


def compact_parquet(spark: SparkSession, src_path: str, dest_path: str,
                    target_file_bytes: int = TARGET_FILE_BYTES,
                    partition_by: list[str] | None = None) -> int:
    """Rewrite ``src_path`` into ``dest_path`` with ~target-sized files.
    Returns the output file count. Uses the on-disk byte size (compressed)
    to pick the count — a deliberate approximation that avoids a data
    pass; repartition(n) rebalances rows evenly so sizes land near the
    target."""
    total = estimate_table_bytes(spark, src_path)
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(src_path)
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest_path)
    return int(n_files)


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Change-data-capture between two table snapshots: one full-outer
    join on the key emitting (keys…, change_type) with change_type in
    {'insert', 'delete', 'update', 'unchanged'}. ``compare_cols`` are
    md5-fingerprinted into a single comparison value so wide rows diff on
    one string compare, not N column compares shuffled in full.

    Scale shape (100 TB): exactly one co-partitioned sort-merge join on
    the key (bucket both snapshots on the key — sources/bucketed.py — and
    the exchange disappears); the projected join payload is keys + one
    32-char hash regardless of row width. This is the plan incremental
    pipelines (Delta CDF, Iceberg changelog) materialize internally;
    plain parquet gets it as a relational expression.
    """
    from pyspark.sql import functions as F

    def fp(df: DataFrame) -> DataFrame:
        sig = F.md5(F.concat_ws("\x1f",
                                *[F.col(c).cast("string") for c in compare_cols]))
        return df.select(*keys, sig.alias("_fp"))

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, keys, "full_outer")
    change = (F.when(F.col("_fp_old").isNull(), F.lit("insert"))
              .when(F.col("_fp_new").isNull(), F.lit("delete"))
              .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
              .otherwise(F.lit("unchanged")))
    return joined.select(*keys, change.alias("change_type"))


def merge_additive_agg(old: DataFrame, delta: DataFrame, keys: list[str],
                       measures: list[str]) -> DataFrame:
    """Incremental view maintenance for ADDITIVE aggregates (SUM/COUNT —
    the self-mergeable ones): fold a delta's partial aggregate into the
    stored aggregate by key. This is the step that lets a 100 TB pipeline
    maintain a rollup by scanning only the day's increment: the merge
    cost is proportional to the two AGGREGATE sizes (key space), never to
    the history that produced them. Non-additive measures (AVG, DISTINCT)
    must be carried as their additive sufficient statistics (sum+count,
    sketch) and finalized on read — same discipline as any partial
    aggregate. Both sides must share the (keys + measures) schema."""
    from pyspark.sql import functions as F

    cols = keys + measures
    return (old.select(*cols).unionByName(delta.select(*cols))
            .groupBy(*keys)
            .agg(*[F.sum(m).alias(m) for m in measures]))


def ensure_agg_snapshot(spark: SparkSession, path: str, fingerprint: str,
                        build) -> DataFrame:
    """Idempotent materialization of an aggregate snapshot as a
    manifest-committed table (sources/txn.py): build once per source
    ``fingerprint``, then serve the committed version — the stored half
    of an incremental-maintenance pair (merge_additive_agg folds deltas
    into it). A fingerprint mismatch (source rewritten) commits a fresh
    version through the transactional layer, so readers mid-query keep
    their snapshot and time travel keeps the history."""
    from . import txn
    from .materialize import ensure_materialized

    ensure_materialized(
        path, fingerprint,
        lambda: txn.commit_version(spark, build(), path),
        teardown=False,  # the txn store versions internally: keep history
        ready=lambda: txn.latest_version(path) is not None)
    return txn.read_version(spark, path)
