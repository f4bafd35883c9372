"""Reference-compatible JSON wire format (SURVEY §1.4).

The reference's only persistence is a whole-database JSON snapshot
(/root/reference/database/database.go:146-182). Format quirks reproduced
byte-for-byte (golden strings in the reference tests):

- record: ``{"blob": <plain string, NOT base64>, "embedding": [..],
  "embedderId": .., "id": ..}`` (custom marshaller,
  records/records.go:19-54; golden records_test.go:33)
- collection: records map serialized under the key **"embeddings"**
  (struct tag collection/collection.go:16; golden collection_test.go:25)
- database: ``{"collections": {<id>: <collection>, ..}}`` with the mutex
  dropped (database/database.go:37-62; golden database_test.go:79)
- Go ``json.Marshal`` sorts map keys and renders integral floats without
  a decimal point (``1.0`` → ``1``) — both reproduced here.

Export is driver-side BY DESIGN: the format is one nested JSON object,
inherently non-splittable — it exists for reference interop only. The
scalable native format is partitioned Parquet
(``SparkEmbeddingDatabase.save_parquet``). Import runs in Spark
(``from_json`` + double ``explode``), but the parse of the single nested
object is necessarily one task — parallelism begins after the explodes;
see ``wire_records_df`` for the limits.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    from go_simple_embedding_database_spark.database import SparkEmbeddingDatabase


def _go_num(v: float) -> Any:
    """Go's encoding/json renders float64 with shortest round-trip notation:
    integral values get NO decimal point (1.0 → "1"). Go uses fixed-point
    ('f') formatting for exponents below 21, so integral values up to 1e21
    print without an exponent — int() is exact for any integral float64 in
    that range."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e21:
        return int(v)
    return v


def _record_obj(blob: str, embedding: list[float], embedder_id: str, rec_id: str) -> dict:
    # Field order pinned by records/records.go:19-54 golden string.
    return {
        "blob": blob,
        "embedding": [_go_num(v) for v in (embedding or [])],
        "embedderId": embedder_id,
        "id": rec_id,
    }


def _dumps(obj: Any) -> str:
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def record_to_json(blob: str, embedding: list[float], embedder_id: str, rec_id: str) -> str:
    return _dumps(_record_obj(blob, embedding, embedder_id, rec_id))


def collection_to_json(collection_id: str, embedder_id: str,
                       records: list[dict] | None = None) -> str:
    recs = {r["id"]: _record_obj(r["blob"], r["embedding"], r["embedder_id"], r["id"])
            for r in (records or [])}
    obj = {
        "id": collection_id,
        "embedderId": embedder_id,
        # Go sorts map keys on marshal.
        "embeddings": {k: recs[k] for k in sorted(recs)},
    }
    return _dumps(obj)


def database_to_json(db: "SparkEmbeddingDatabase") -> str:
    """Whole-DB snapshot (ToFile body, database/database.go:165-182).

    Collects the records table — acceptable because this format is a
    single JSON object and exists only for reference interop; Parquet is
    the native sink."""
    by_coll: dict[str, dict[str, dict]] = {c: {} for c in db.list_collections()}
    for row in db.records_df().collect():
        by_coll.setdefault(row.collection_id, {})[row.id] = _record_obj(
            row.blob, list(row.embedding or []), row.embedder_id, row.id
        )
    collections = {
        cid: {
            "id": info.collection_id,
            "embedderId": info.embedder_id,
            "embeddings": {k: by_coll.get(cid, {})[k] for k in sorted(by_coll.get(cid, {}))},
        }
        for cid, info in sorted(db.list_collections().items())
    }
    return _dumps({"collections": collections})


def database_to_file(db: "SparkEmbeddingDatabase", path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(database_to_json(db))


# -- distributed import ------------------------------------------------------

_RECORD_STRUCT = T.StructType([
    T.StructField("blob", T.StringType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
    T.StructField("embedderId", T.StringType()),
    T.StructField("id", T.StringType()),
])
_COLLECTION_STRUCT = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("embedderId", T.StringType()),
    T.StructField("embeddings", T.MapType(T.StringType(), _RECORD_STRUCT)),
])
_DB_STRUCT = T.StructType([
    T.StructField("collections", T.MapType(T.StringType(), _COLLECTION_STRUCT)),
])


def wire_records_df(spark: SparkSession, path: str) -> DataFrame:
    """Parse a reference snapshot into the engine records schema in Spark:
    text → ``from_json`` with map-typed schema → double ``explode``
    (maps-with-dynamic-keys become rows — SURVEY §1.4).

    Scale honesty: the snapshot is ONE nested JSON object, so the parse
    itself is a single task (and a single text cell, capped at ~2 GB) —
    the format is inherently non-splittable. Parallelism begins after the
    explodes. This path exists for reference interop; bulk data belongs
    in partitioned Parquet (``save_parquet``)."""
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(F.from_json("value", _DB_STRUCT).alias("db"))
    return _records_from_parsed(parsed)


def _records_from_parsed(parsed: DataFrame) -> DataFrame:
    colls = parsed.select(F.explode("db.collections").alias("collection_id", "coll"))
    recs = colls.select(
        "collection_id",
        F.explode("coll.embeddings").alias("_rid", "rec"),
    )
    return recs.select(
        F.col("collection_id"),
        F.col("rec.id").alias("id"),
        F.col("rec.embedderId").alias("embedder_id"),
        F.col("rec.blob").alias("blob"),
        F.col("rec.embedding").alias("embedding"),
    )


def database_from_file(spark: SparkSession, path: str) -> "SparkEmbeddingDatabase":
    """FromFile (database/database.go:146-163). The catalog is rebuilt from
    the (tiny) collection headers; records load distributed. Embedder ids
    are NOT validated on load — parity with the reference, which
    unmarshals without resolving embedders."""
    from go_simple_embedding_database_spark.database import (
        CollectionInfo,
        SparkEmbeddingDatabase,
    )

    db = SparkEmbeddingDatabase(spark)
    raw = spark.read.text(path, wholetext=True)
    # Unparseable input must error like the reference's json.Unmarshal
    # (database/database.go:155-160), not silently yield an empty DB —
    # from_json returns NULL on malformed input. The parsed snapshot is
    # persisted so validation, headers, and the records relation all read
    # ONE parse instead of re-parsing the file per action (measured 3
    # full parses before).
    parsed = raw.select(F.from_json("value", _DB_STRUCT).alias("db")).persist()
    # Empty input parses to zero rows, malformed input to NULL structs —
    # both must raise, not silently yield an empty DB.
    counts = parsed.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("db").isNull() | F.col("db.collections").isNull(), 1)).alias("bad"),
    ).collect()[0]
    if counts.total == 0 or counts.bad > 0:
        parsed.unpersist()
        raise ValueError(f"not a valid database snapshot: {path}")
    headers = (
        parsed.select(F.explode("db.collections").alias("collection_id", "coll"))
        .select("collection_id", F.col("coll.embedderId").alias("embedder_id"))
        .collect()
    )
    for r in headers:
        db._catalog[r.collection_id] = CollectionInfo(r.collection_id, r.embedder_id)
    db._records = _records_from_parsed(parsed).select(
        "collection_id", "id", "embedder_id", "blob",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    return db
