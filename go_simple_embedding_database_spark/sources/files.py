"""Generic file-format connectors (CSV, JSON-lines) for records-shaped data.

The reference reads exactly one format — its whole-DB JSON snapshot
(sources/json_wire.py). These connectors cover the formats bulk corpora
actually arrive in, with the 100 TB ground rules baked in:

- **schema is explicit, never inferred**: inference is a full extra pass
  over the data (and nondeterministic under dirty rows). Callers pass a
  DDL string; the records-table schema is the default.
- **bad rows quarantine, not crash**: PERMISSIVE mode with a
  ``_corrupt_record`` column; ``strict=True`` switches to FAILFAST for
  validation runs.
- both formats are splittable line-by-line (uncompressed / bzip2), so
  scans parallelize; writers partition by ``collection_id`` when present.
"""

from __future__ import annotations

import os
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession

RECORDS_DDL = (
    "collection_id string, id string, embedder_id string, "
    "blob string, embedding array<double>"
)
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


def read_jsonl(spark: SparkSession, path: str, schema: str = RECORDS_DDL,
               strict: bool = False) -> DataFrame:
    """One JSON object per line. Malformed lines land in _corrupt_record
    (filter ``IS NOT NULL`` for the quarantine set) unless strict.

    Spark restriction: a query referencing ONLY the corrupt column is
    disallowed on raw JSON/CSV scans — ``.cache()`` the DataFrame (as the
    tests do) before building a quarantine-only extract."""
    reader = spark.read.schema(schema if strict else _with_corrupt(schema))
    reader = reader.option("mode", "FAILFAST" if strict else "PERMISSIVE") \
                   .option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if "collection_id" in df.columns:
        w = w.partitionBy("collection_id")
    w.json(path)


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True, strict: bool = False) -> DataFrame:
    """CSV is scalars-only: Spark's CSV source rejects array/map/struct
    columns, so the full records schema (embedding array<double>) cannot
    ride CSV — use JSONL or parquet for records, CSV for flat exports.
    The guard below turns Spark's late AnalysisException into an
    immediate, explicit error."""
    _reject_nested("read_csv", schema)
    reader = (spark.read.schema(schema if strict else _with_corrupt(schema))
              .option("header", str(header).lower())
              .option("mode", "FAILFAST" if strict else "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL))
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    nested = [f.name for f in df.schema.fields
              if f.dataType.typeName() in ("array", "map", "struct")]
    if nested:
        raise ValueError(
            f"write_csv: CSV cannot carry nested columns {nested} — "
            f"serialize with to_json first, or use JSONL/parquet")
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def _reject_nested(op: str, schema: str) -> None:
    low = schema.lower()
    if "array<" in low or "map<" in low or "struct<" in low:
        raise ValueError(
            f"{op}: CSV cannot carry nested types ({schema!r}) — serialize "
            f"arrays with to_json first, or use JSONL/parquet")


def read_orc(spark: SparkSession, path: str,
             schema: str | None = None) -> DataFrame:
    """ORC connector (columnar sibling of parquet, common in Hive-era
    warehouses). Self-describing: schema comes from the file footer; pass
    ``schema`` only to assert/prune the expected shape (mismatches fail at
    analysis, not mid-job). Predicate pushdown and column pruning work as
    for parquet — the vectorized ORC reader is on by default."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if "collection_id" in df.columns:
        w = w.partitionBy("collection_id")
    w.orc(path)


# -- raw media files (binaryFile source) --------------------------------------

_MEDIA_EXT = {
    "jpg": ("image", "image/jpeg"), "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"), "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"), "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"), "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def read_media_dir(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Raw media files -> the MEDIA_SCHEMA shape (schema.py) consumed by
    operators.multimodal, via Spark's built-in ``binaryFile`` source.

    Why binaryFile and not a Python loop: the LISTING is driver-side but
    the READS are executor-side, one task per file (capped by
    ``spark.sql.files.maxPartitionBytes`` bin-packing for small files),
    and the source pushes filters on the metadata columns — a
    ``length < X`` predicate skips oversized payloads WITHOUT reading
    their bytes. Modality/mime are derived from the extension (a pure
    Catalyst map lookup); unknown extensions become ('binary',
    'application/octet-stream'), never a dropped row.

    At 100 TB the small-file problem is the operative risk: millions of
    tiny files bound throughput on listing + open() calls, so a real
    pipeline runs this ONCE and lands the payloads in Parquet
    (payload binary + typed metadata columns) — the layout every
    downstream decode/dedup pass should scan instead."""
    from pyspark.sql import functions as F

    # recursiveFileLookup: media corpora are routinely sharded into
    # subdirectories (date=.../camera=...); without it the listing stops
    # at the top level and a glob silently matches nothing one level down.
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    pairs = [x for k, (m, t) in sorted(_MEDIA_EXT.items()) for x in (k, m)]
    mimes = [x for k, (m, t) in sorted(_MEDIA_EXT.items()) for x in (k, t)]
    modality = F.coalesce(
        F.element_at(F.create_map(*[F.lit(x) for x in pairs]), ext),
        F.lit("binary"))
    mime = F.coalesce(
        F.element_at(F.create_map(*[F.lit(x) for x in mimes]), ext),
        F.lit("application/octet-stream"))
    # media_id = path RELATIVE to the load root, not the basename: two
    # files with the same name in different subdirectories must not
    # collide on the downstream join/dedup key (the full URI stays in
    # meta for provenance). The listed `path` column is a URI, so the
    # root is matched in several spellings — the raw argument (covers
    # s3a://bucket/dir and friends verbatim), the local absolute path
    # (covers relative local args), and its URI-encoded form (Spark
    # percent-encodes e.g. spaces in local URIs). First match wins;
    # if none matches, fall back to the basename rather than guessing.
    candidates = [path.rstrip("/")]
    if "://" not in path:  # os.path.abspath would mangle a remote URI
        local = os.path.abspath(path).rstrip("/")
        candidates.append(local)
        candidates.append(quote(local))
    media_id = None
    for root in dict.fromkeys(candidates):
        pos = F.locate(root + "/", F.col("path"))
        rel = F.col("path").substr(pos + len(root) + 1, F.length("path"))
        media_id = (F.when(pos > 0, rel) if media_id is None
                    else media_id.when(pos > 0, rel))
    media_id = media_id.otherwise(
        F.element_at(F.split(F.col("path"), "/"), -1))
    return raw.select(
        media_id.alias("media_id"),
        modality.alias("modality"),
        F.col("content").alias("payload"),
        mime.alias("mime_type"),
        F.map_from_arrays(
            F.array(F.lit("path"), F.lit("n_bytes"), F.lit("mtime")),
            F.array(F.col("path"), F.col("length").cast("string"),
                    F.col("modificationTime").cast("string"))).alias("meta"),
    )
