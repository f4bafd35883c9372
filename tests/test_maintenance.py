"""Small-file compaction: many files in, few size-targeted files out,
data intact."""

import os

from go_simple_embedding_database_spark.sources.maintenance import (
    compact_parquet,
    estimate_table_bytes,
)


def _parquet_files(path):
    out = []
    for root, _, names in os.walk(path):
        out += [os.path.join(root, n) for n in names
                if n.endswith(".parquet") and not n.startswith(".")]
    return out


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(40).write.parquet(src)   # simulate micro-batch litter
    assert len(_parquet_files(src)) == 40

    est = estimate_table_bytes(spark, src)
    assert est > 0

    dest = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dest, target_file_bytes=est)  # -> 1 file
    assert n == 1
    assert len(_parquet_files(dest)) == 1
    assert spark.read.parquet(dest).count() == docs.count()


def test_compaction_respects_partitioning(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(10).write.parquet(src)
    dest = str(tmp_path / "comp2")
    compact_parquet(spark, src, dest, target_file_bytes=10**12,
                    partition_by=["lang"])
    out = spark.read.parquet(dest)
    assert out.count() == docs.count()
    assert sorted(os.listdir(dest))[0].startswith("lang=") or \
        any(d.startswith("lang=") for d in os.listdir(dest))


def test_snapshot_diff_classifies_all_change_types(spark):
    from go_simple_embedding_database_spark.sources.maintenance import (
        snapshot_diff)

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "id bigint, text string")
    got = {r.id: r.change_type
           for r in snapshot_diff(old, new, ["id"], ["text"]).collect()}
    assert got == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}


def test_snapshot_diff_multi_column_fingerprint(spark):
    """A change in ANY compare column flips the row to update; columns
    outside compare_cols are ignored."""
    from go_simple_embedding_database_spark.sources.maintenance import (
        snapshot_diff)

    old = spark.createDataFrame([(1, "a", "x", 9)],
                                "id bigint, t1 string, t2 string, junk int")
    changed_t2 = spark.createDataFrame([(1, "a", "y", 9)],
                                       "id bigint, t1 string, t2 string, junk int")
    changed_junk = spark.createDataFrame([(1, "a", "x", 7)],
                                         "id bigint, t1 string, t2 string, junk int")
    assert snapshot_diff(old, changed_t2, ["id"], ["t1", "t2"]) \
        .collect()[0].change_type == "update"
    assert snapshot_diff(old, changed_junk, ["id"], ["t1", "t2"]) \
        .collect()[0].change_type == "unchanged"


def test_merge_additive_agg_equals_full_agg(spark):
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.sources.maintenance import (
        merge_additive_agg)

    rows = [(i % 5, i, i * 3) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint")

    def agg(d):
        return d.groupBy("k").agg(F.count("*").alias("n"),
                                  F.sum("b").alias("sb"))

    full = {(r.k, r.n, r.sb) for r in agg(df).collect()}
    merged = merge_additive_agg(agg(df.filter("a < 40")),
                                agg(df.filter("a >= 40")),
                                ["k"], ["n", "sb"])
    assert {(r.k, r.n, r.sb) for r in merged.collect()} == full


def test_merge_additive_agg_disjoint_keys(spark):
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.sources.maintenance import (
        merge_additive_agg)

    old = spark.createDataFrame([(1, 10)], "k bigint, n bigint")
    delta = spark.createDataFrame([(2, 5)], "k bigint, n bigint")
    got = {(r.k, r.n) for r in
           merge_additive_agg(old, delta, ["k"], ["n"]).collect()}
    assert got == {(1, 10), (2, 5)}


def test_ensure_agg_snapshot_builds_once_and_on_fingerprint_change(
        spark, tmp_path):
    from go_simple_embedding_database_spark.sources.maintenance import (
        ensure_agg_snapshot)
    from go_simple_embedding_database_spark.sources import txn

    path = str(tmp_path / "mv")
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(1, len(calls))], "k bigint, v bigint")

    a = ensure_agg_snapshot(spark, path, "fp1", build).collect()
    b = ensure_agg_snapshot(spark, path, "fp1", build).collect()
    assert len(calls) == 1 and a == b
    # source rewritten -> new fingerprint -> rebuild as a NEW committed
    # version; the old snapshot stays readable (time travel)
    c = ensure_agg_snapshot(spark, path, "fp2", build)
    assert len(calls) == 2 and c.collect()[0].v == 2
    assert txn.read_version(spark, path, 1).collect()[0].v == 1
