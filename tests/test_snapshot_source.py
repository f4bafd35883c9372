"""Custom Python DataSource for reference snapshots (sources/snapshot_source)."""

import json

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.sources.json_wire import (
    wire_records_df)
from go_simple_embedding_database_spark.sources.snapshot_source import (
    SNAPSHOT_FORMAT, register_snapshot_source)


def _write_snapshot(path, collections):
    """collections: {cid: {rid: (blob, embedding, embedder)}}"""
    doc = {"collections": {
        cid: {"id": cid, "embedderId": "mock-hash-64",
              "embeddings": {rid: {"blob": b, "embedding": e,
                                   "embedderId": emb, "id": rid}
                             for rid, (b, e, emb) in recs.items()}}
        for cid, recs in collections.items()}}
    path.write_text(json.dumps(doc), encoding="utf-8")


@pytest.fixture()
def snapshot_dir(tmp_path):
    _write_snapshot(tmp_path / "a.json", {
        "c1": {"r1": ("hello", [1.0, 2.0], "mock-hash-64"),
               "r2": ("world", [3.0], "mock-hash-64")}})
    _write_snapshot(tmp_path / "b.json", {
        "c2": {"r3": ("again", [], "mock-hash-64")}})
    return tmp_path


def test_reads_directory_one_partition_per_file(spark, snapshot_dir):
    register_snapshot_source(spark)
    df = spark.read.format(SNAPSHOT_FORMAT).load(str(snapshot_dir))
    assert df.columns == ["collection_id", "id", "embedder_id", "blob",
                          "embedding"]
    rows = {(r.collection_id, r.id): (r.blob, list(r.embedding))
            for r in df.collect()}
    assert rows == {("c1", "r1"): ("hello", [1.0, 2.0]),
                    ("c1", "r2"): ("world", [3.0]),
                    ("c2", "r3"): ("again", [])}
    assert df.rdd.getNumPartitions() == 2  # one per snapshot file


def test_matches_json_wire_import(spark, snapshot_dir):
    register_snapshot_source(spark)
    one = str(snapshot_dir / "a.json")
    via_source = spark.read.format(SNAPSHOT_FORMAT).load(one)
    via_wire = wire_records_df(spark, one)
    assert (sorted(map(tuple, via_source.collect()))
            == sorted(map(tuple, via_wire.collect())))


def test_sql_using_clause(spark, snapshot_dir):
    register_snapshot_source(spark)
    spark.sql(f"""CREATE OR REPLACE TEMPORARY VIEW snap
                  USING {SNAPSHOT_FORMAT} OPTIONS (path '{snapshot_dir}')""")
    assert spark.sql(
        "SELECT count(*) AS n FROM snap").collect()[0].n == 3


def test_malformed_file_raises(spark, tmp_path):
    register_snapshot_source(spark)
    bad = tmp_path / "bad.json"
    bad.write_text("{not json", encoding="utf-8")
    with pytest.raises(Exception, match="not a valid database snapshot"):
        spark.read.format(SNAPSHOT_FORMAT).load(str(bad)).collect()
    nodict = tmp_path / "nodict.json"
    nodict.write_text("[1,2]", encoding="utf-8")
    with pytest.raises(Exception, match="not a valid database snapshot"):
        spark.read.format(SNAPSHOT_FORMAT).load(str(nodict)).collect()


def test_missing_path_raises(spark, tmp_path):
    register_snapshot_source(spark)
    with pytest.raises(Exception):
        spark.read.format(SNAPSHOT_FORMAT).load(
            str(tmp_path / "nope")).collect()


def test_filter_pushes_into_spark_plan(spark, snapshot_dir):
    # Source yields rows; Spark applies the filter — results must respect it.
    register_snapshot_source(spark)
    df = (spark.read.format(SNAPSHOT_FORMAT).load(str(snapshot_dir))
          .filter(F.col("collection_id") == "c1"))
    assert {r.id for r in df.collect()} == {"r1", "r2"}
