"""File connectors: JSONL/CSV round-trips, quarantine of malformed rows."""

import json

import pytest

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.sources import files


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("c1", "a", "e", "blob a", [1.0, 2.0]),
         ("c2", "b", "e", "blob b", [3.0, 4.0])],
        files.RECORDS_DDL)
    out = str(tmp_path / "recs_jsonl")
    files.write_jsonl(df, out)
    back = files.read_jsonl(spark, out).drop(files.CORRUPT_COL)

    def key(r):
        return (r.collection_id, r.id, r.embedder_id, r.blob, tuple(r.embedding))

    assert {key(r) for r in back.select(*df.columns).collect()} == \
           {key(r) for r in df.collect()}


def test_jsonl_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    rows = [
        json.dumps({"collection_id": "c", "id": "1", "embedder_id": "e",
                    "blob": "x", "embedding": [1.0]}),
        "{this is not json",
    ]
    p.write_text("\n".join(rows))
    df = files.read_jsonl(spark, str(p)).cache()
    assert df.filter(F.col(files.CORRUPT_COL).isNotNull()).count() == 1
    assert df.filter(F.col(files.CORRUPT_COL).isNull()).count() == 1


def test_csv_roundtrip(spark, tmp_path):
    schema = "doc_id bigint, lang string, n_chars bigint"
    df = spark.createDataFrame([(1, "en", 10), (2, "de", 20)], schema)
    out = str(tmp_path / "docs_csv")
    files.write_csv(df, out)
    back = files.read_csv(spark, out, schema).drop(files.CORRUPT_COL)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_csv_quarantines_bad_types(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("doc_id,lang,n_chars\n1,en,10\nnot_a_number,de,xx\n")
    df = files.read_csv(spark, str(p), "doc_id bigint, lang string, n_chars bigint")
    df = df.cache()
    assert df.filter(F.col(files.CORRUPT_COL).isNotNull()).count() == 1
    assert df.filter((F.col(files.CORRUPT_COL).isNull())
                     & (F.col("doc_id") == 1)).count() == 1


def test_bucketed_copy_validates_layout(spark):
    """ensure_bucketed_copy must reuse a matching table, and refuse a
    same-named table with a different bucket layout (a silent mismatch
    would reintroduce the join shuffles bucketing exists to remove)."""
    import pytest
    from go_simple_embedding_database_spark.sources import bucketed

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    name = "b_layout_check"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    t1 = bucketed.ensure_bucketed_copy(spark, df, name, ["k"], 4)
    assert t1.count() == 2
    # same layout -> reuse
    assert bucketed.ensure_bucketed_copy(spark, df, name, ["k"], 4).count() == 2
    # different count or columns -> loud failure
    with pytest.raises(ValueError, match="layout"):
        bucketed.ensure_bucketed_copy(spark, df, name, ["k"], 8)
    with pytest.raises(ValueError, match="layout"):
        bucketed.ensure_bucketed_copy(spark, df, name, ["v"], 4)
    spark.sql(f"DROP TABLE {name}")
    # stale-data guard: fingerprint stored on write; a changed fingerprint
    # rebuilds the copy with the NEW source data instead of serving stale
    t2 = bucketed.ensure_bucketed_copy(spark, df, name, ["k"], 4, fingerprint="v1")
    assert t2.count() == 2
    df3 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")
    same = bucketed.ensure_bucketed_copy(spark, df3, name, ["k"], 4, fingerprint="v1")
    assert same.count() == 2  # unchanged fingerprint -> stale reuse by design
    fresh = bucketed.ensure_bucketed_copy(spark, df3, name, ["k"], 4, fingerprint="v2")
    assert fresh.count() == 3  # changed fingerprint -> rebuilt
    spark.sql(f"DROP TABLE {name}")


def test_bucketed_copy_rejects_odd_table_names(spark):
    """Table names are interpolated into DDL — anything outside
    [A-Za-z0-9_]+ is refused up front (advisor finding, round 1)."""
    import pytest
    from go_simple_embedding_database_spark.sources import bucketed

    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    for bad in ["t;drop", "a table", "t`x", "sch.tbl", ""]:
        with pytest.raises(ValueError, match="invalid table name"):
            bucketed.ensure_bucketed_copy(spark, df, bad, ["k"], 4)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC carries the FULL records schema (arrays included, unlike CSV)
    and the scan supports filter pushdown like parquet."""
    from go_simple_embedding_database_spark.sources.files import (
        read_orc, write_orc)
    df = spark.createDataFrame(
        [("c1", "r1", "mock-hash-64", "hello", [0.1, 0.2]),
         ("c1", "r2", "mock-hash-64", "world", [0.3, 0.4]),
         ("c2", "r3", "mock-hash-64", "again", None)],
        "collection_id string, id string, embedder_id string, "
        "blob string, embedding array<double>")
    path = str(tmp_path / "records_orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 3
    assert sorted(r.id for r in back.collect()) == ["r1", "r2", "r3"]
    # partitioned layout by collection_id + pushdown evidence in the plan
    q = back.filter("id = 'r2'").select("id", "blob")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,r2)]" in plan
    assert [r.blob for r in q.collect()] == ["world"]


# -- binaryFile media connector -----------------------------------------------

class TestReadMediaDir:
    @pytest.fixture()
    def media_dir(self, tmp_path):
        (tmp_path / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
        (tmp_path / "b.wav").write_bytes(b"RIFFfakewav")
        (tmp_path / "c.xyz").write_bytes(b"mystery")
        return tmp_path

    def test_maps_to_media_schema(self, spark, media_dir):
        from go_simple_embedding_database_spark.sources.files import (
            read_media_dir)
        df = read_media_dir(spark, str(media_dir))
        assert df.columns == ["media_id", "modality", "payload",
                              "mime_type", "meta"]
        rows = {r.media_id: r for r in df.collect()}
        assert rows["a.jpg"].modality == "image"
        assert rows["a.jpg"].mime_type == "image/jpeg"
        assert bytes(rows["a.jpg"].payload) == b"\xff\xd8fakejpeg"
        assert rows["b.wav"].modality == "audio"
        assert rows["c.xyz"].modality == "binary"  # unknown ext kept
        assert rows["c.xyz"].mime_type == "application/octet-stream"
        assert rows["a.jpg"].meta["n_bytes"] == "10"

    def test_subdir_same_basename_does_not_collide(self, spark, tmp_path):
        from go_simple_embedding_database_spark.sources.files import (
            read_media_dir)
        (tmp_path / "x").mkdir()
        (tmp_path / "y").mkdir()
        (tmp_path / "x" / "a.jpg").write_bytes(b"\xff\xd8one")
        (tmp_path / "y" / "a.jpg").write_bytes(b"\xff\xd8two")
        df = read_media_dir(spark, str(tmp_path), glob="*.jpg")
        ids = sorted(r.media_id for r in df.collect())
        assert ids == ["x/a.jpg", "y/a.jpg"]  # relative path, no collision

    def test_glob_filter_and_metadata_compose(self, spark, media_dir):
        from go_simple_embedding_database_spark.operators.multimodal import (
            media_metadata)
        from go_simple_embedding_database_spark.sources.files import (
            read_media_dir)
        df = read_media_dir(spark, str(media_dir), glob="*.jpg")
        assert df.count() == 1
        meta = media_metadata(df).collect()[0]
        assert meta.n_bytes == 10 and meta.modality == "image"

    def test_length_filter_pushed_to_source(self, spark, media_dir):
        from go_simple_embedding_database_spark.plans.explain_utils import (
            formatted_plan)
        raw = (spark.read.format("binaryFile").load(str(media_dir))
               .filter("length < 5"))
        plan = formatted_plan(raw)
        assert "PushedFilters" in plan and "length" in plan
        assert raw.count() == 0  # every fixture payload is larger


class TestMediaIdRoots:
    def test_dir_with_space_still_gets_relative_id(self, spark, tmp_path):
        from go_simple_embedding_database_spark.sources.files import (
            read_media_dir)
        root = tmp_path / "my media"
        (root / "x").mkdir(parents=True)
        (root / "y").mkdir()
        (root / "x" / "a.jpg").write_bytes(b"\xff\xd8one")
        (root / "y" / "a.jpg").write_bytes(b"\xff\xd8two")
        df = read_media_dir(spark, str(root), glob="*.jpg")
        ids = sorted(r.media_id for r in df.collect())
        # Spark percent-encodes the space in the listed URI; the
        # URI-encoded root candidate must still strip it
        assert ids == ["x/a.jpg", "y/a.jpg"]
