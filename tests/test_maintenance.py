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
