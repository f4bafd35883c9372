"""Golden-string wire-format tests — byte-exact fixtures lifted from the
reference tests (FIXTURES.md §6; /root/reference/records/records_test.go:33,
collection/collection_test.go:25, database/database_test.go:79)."""

import json

from go_simple_embedding_database_spark.database import SparkEmbeddingDatabase
from go_simple_embedding_database_spark.sources.json_wire import (
    collection_to_json,
    database_to_json,
    record_to_json,
    wire_records_df,
)

GOLDEN_RECORD = '{"blob":"blob","embedding":[1],"embedderId":"embedder","id":"record-id"}'
GOLDEN_EMPTY_COLLECTION = (
    '{"id":"test-json-serializing","embedderId":"mock-embedder","embeddings":{}}'
)
GOLDEN_DATABASE = (
    '{"collections":{"test-collection-id":{"id":"test-collection-id",'
    '"embedderId":"mock-embed","embeddings":{"test-record-id":{"blob":"blob",'
    '"embedding":[1,2,3,4,5],"embedderId":"mock-embed","id":"test-record-id"}}}}}'
)


def test_record_golden():
    assert record_to_json("blob", [1.0], "embedder", "record-id") == GOLDEN_RECORD


def test_empty_collection_golden():
    assert collection_to_json("test-json-serializing", "mock-embedder") == GOLDEN_EMPTY_COLLECTION


def test_database_golden(spark):
    db = SparkEmbeddingDatabase(spark)
    # "mock-embed" isn't registered — build the catalog the import way,
    # matching the reference which never validates embedders on unmarshal.
    from go_simple_embedding_database_spark.database import CollectionInfo

    db._catalog["test-collection-id"] = CollectionInfo("test-collection-id", "mock-embed")
    df = spark.createDataFrame(
        [("test-collection-id", "test-record-id", "mock-embed", "blob",
          [1.0, 2.0, 3.0, 4.0, 5.0])],
        "collection_id string, id string, embedder_id string, blob string, embedding array<double>",
    )
    db._records = df
    assert database_to_json(db) == GOLDEN_DATABASE


def test_file_roundtrip(spark, tmp_path):
    # database_test.go:19-51: ToFile → FromFile → DeepEqual.
    path = str(tmp_path / "db.json")
    with open(path, "w") as f:
        f.write(GOLDEN_DATABASE)
    db = SparkEmbeddingDatabase.from_file(spark, path)
    assert set(db.list_collections()) == {"test-collection-id"}
    rec = db.get_record("test-collection-id", "test-record-id")
    assert rec.blob == "blob"
    assert list(rec.embedding) == [1.0, 2.0, 3.0, 4.0, 5.0]
    out = str(tmp_path / "out.json")
    db.to_file(out)
    assert open(out).read() == GOLDEN_DATABASE


def test_distributed_import_schema(spark, tmp_path):
    path = str(tmp_path / "db.json")
    with open(path, "w") as f:
        f.write(GOLDEN_DATABASE)
    df = wire_records_df(spark, path)
    assert df.columns == ["collection_id", "id", "embedder_id", "blob", "embedding"]
    assert df.count() == 1


def test_malformed_file_errors(spark, tmp_path):
    # database/database.go:155-160: unmarshal failure is an error, not an
    # empty database.
    import pytest

    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="not a valid database snapshot"):
        SparkEmbeddingDatabase.from_file(spark, path)


def test_unicode_blob_roundtrip(spark, tmp_path):
    # Blob is a plain JSON string (NOT base64) — records/records.go:24-29.
    db = SparkEmbeddingDatabase(spark)
    db.add_collection("c", "mock-constant")
    db.add_record("c", db.make_record("mock-constant", "héllo wörld ☃", "u1"))
    path = str(tmp_path / "u.json")
    db.to_file(path)
    obj = json.load(open(path, encoding="utf-8"))
    assert obj["collections"]["c"]["embeddings"]["u1"]["blob"] == "héllo wörld ☃"
    db2 = SparkEmbeddingDatabase.from_file(spark, path)
    assert db2.get_record("c", "u1").blob == "héllo wörld ☃"
