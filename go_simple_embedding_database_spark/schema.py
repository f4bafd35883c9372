"""Canonical engine schemas (SURVEY.md §1.3).

The reference's two nested hash maps (database→collections→records,
database/database.go:27-30, collection/collection.go:13-17) flatten to ONE
records DataFrame partitioned by ``collection_id`` plus a tiny collections
catalog. Partitioning by ``collection_id`` gives collection isolation and
partition pruning at any scale — a query against one collection never
touches another collection's files.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Record{Embedding, EmbedderId, Blob, Id} (records/records.go:11-16),
# flattened with its owning collection id.
RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("collection_id", T.StringType(), nullable=False),
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("embedder_id", T.StringType(), nullable=False),
        T.StructField("blob", T.StringType(), nullable=True),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), nullable=True),
    ]
)

# Collection{Id, EmbedderId} (collection/collection.go:14-15) minus the
# records map (which became rows above).
COLLECTIONS_SCHEMA = T.StructType(
    [
        T.StructField("collection_id", T.StringType(), nullable=False),
        T.StructField("embedder_id", T.StringType(), nullable=False),
    ]
)

# Multimodal extension: opaque media payloads as binary + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("modality", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), nullable=True),
        T.StructField("mime_type", T.StringType(), nullable=True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), nullable=True),
    ]
)
