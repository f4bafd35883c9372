"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship top-k cosine query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 + the
LLM-pipeline extensions); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column-name discipline: every computed column is aliased identically on
both sides; float outputs are rounded to 6 decimals on both sides so the
driver's order-insensitive value hash is stable across engines (Spark and
DuckDB agree bit-for-bit on round(x, 6) of near-identical doubles).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_simple_embedding_database_spark.functions.embedders import hash64_oracle_sql, get_embedder
from go_simple_embedding_database_spark.functions.kernels import cosine_similarity
from go_simple_embedding_database_spark.operators.topk import batch_topk, topk_by_similarity

SF0001 = "/root/testdata/sf0.001"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).collect()[0]
    return [float(v) for v in row.embedding]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-5 nearest neighbors of vec_id=0 by cosine similarity —
    the reference's §3.1 query pipeline (scan → kernel → top-k) minus the
    remote embedder, planned as TakeOrderedAndProject."""
    qvec = _query_vec(spark, SF0001, 0)
    out = topk_by_similarity(
        _emb(spark, SF0001), qvec, 5, score_col="sim", tie_break=["vec_id"]
    )
    return out.select("vec_id", "label", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------

def _q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 Query: single-query top-k=5 (collection/collection.go:64-151)."""
    qvec = _query_vec(spark, sf_dir, 0)
    out = topk_by_similarity(_emb(spark, sf_dir), qvec, 5,
                             score_col="sim", tie_break=["vec_id"])
    return out.select("vec_id", "label", F.round("sim", 6).alias("sim"))


_ORACLE_TOPK = """
SELECT vec_id, label,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC, vec_id
LIMIT 5
"""


def _q_topk_small_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 point 2: k > N short-circuit — 3 records, k=10 → all 3 back,
    no error (collection/collection.go:75-82)."""
    small = _emb(spark, sf_dir).filter(F.col("vec_id") < 3)
    qvec = _query_vec(spark, sf_dir, 0)
    out = topk_by_similarity(small, qvec, 10, score_col="sim", tie_break=["vec_id"])
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


_ORACLE_TOPK_SMALL = """
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
FROM embeddings WHERE vec_id < 3
ORDER BY 2 DESC, vec_id LIMIT 10
"""


def _q_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-of-queries generalization: 3 query vectors × top-3 each in ONE
    scan (broadcast queries + row_number window)."""
    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_embedding")))
    out = batch_topk(emb, queries, 3, score_col="sim", tie_break=["vec_id"])
    return out.select("query_id", "vec_id", F.round("sim", 6).alias("sim"))


_ORACLE_BATCH_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qe FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS s
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(s, 6) AS sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) rn FROM scored)
WHERE rn <= 3
"""


def _q_cosine_kernel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel exactness over real vectors: all pairs among vec_id<10
    (utils/utils.go:9-24 parity, including f64 promotion of f32 storage)."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 10)
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.crossJoin(b).filter(F.col("a.vec_id") <= F.col("b.vec_id"))
    return pairs.select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 6).alias("sim"),
    )


_ORACLE_KERNEL_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a, embeddings b
WHERE a.vec_id < 10 AND b.vec_id < 10 AND a.vec_id <= b.vec_id
"""


def _q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 GetRecord: point lookup by key — filter pushed to the parquet
    scan (database/database.go:83-89)."""
    return _docs(spark, sf_dir).filter(F.col("doc_id") == 42).select(
        "doc_id", "lang", "source", "n_chars")


_ORACLE_POINT_LOOKUP = "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42"


def _q_collections_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.1 GetCollections analog: the label column as a collection
    surrogate — catalog listing with record counts."""
    return (_emb(spark, sf_dir).groupBy(F.col("label").alias("collection_id"))
            .agg(F.count("*").alias("n_records")))


_ORACLE_CATALOG = """
SELECT label AS collection_id, count(*) AS n_records FROM embeddings GROUP BY label
"""


def _q_ingest_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 MakeRecord bulk: embed every document with the deterministic
    mock-hash-64 embedder (Arrow-batched pandas_udf; records/records.go:81-92
    re-expressed as a batch transform). The embed runs ONCE per row — the
    vector column materializes behind a repartition barrier so the three
    projections below don't re-evaluate it — and the repartition also lifts
    a single-split parquet input to full-cluster parallelism for the
    CPU-bound embed stage. Output pins a slice of the vector so the oracle
    check is exact."""
    emb = get_embedder("mock-hash-64")
    docs = _docs(spark, sf_dir)
    parallelism = spark.sparkContext.defaultParallelism
    vdf = docs.repartition(parallelism).select(
        "doc_id", emb.column(F.col("text")).alias("vec"))
    return vdf.select(
        "doc_id",
        F.round(F.element_at("vec", 1), 6).alias("e0"),
        F.round(F.element_at("vec", 64), 6).alias("e63"),
        F.round(F.aggregate("vec", F.lit(0.0), lambda a, v: a + v * v), 6).alias("norm_sq"),
    )


_ORACLE_INGEST = f"""
WITH v AS (SELECT doc_id, {hash64_oracle_sql('text')} AS vec FROM documents)
SELECT doc_id, round(vec[1], 6) AS e0, round(vec[64], 6) AS e63,
       round(list_sum(list_transform(vec, x -> x*x)), 6) AS norm_sq
FROM v
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline extension: exact dedup by content hash — keep the minimum
    doc_id per sha256(text) group, count the cluster."""
    docs = _docs(spark, sf_dir)
    return (docs.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("content_hash"))
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies")))


_ORACLE_DEDUP_EXACT = """
SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY sha256(text)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "topk_cosine": _q_topk_cosine,
        "topk_small_collection": _q_topk_small_collection,
        "batch_topk": _q_batch_topk,
        "cosine_kernel_pairs": _q_cosine_kernel_pairs,
        "point_lookup": _q_point_lookup,
        "collections_catalog": _q_collections_catalog,
        "ingest_embed": _q_ingest_embed,
        "dedup_exact": _q_dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "topk_cosine": _ORACLE_TOPK,
        "topk_small_collection": _ORACLE_TOPK_SMALL,
        "batch_topk": _ORACLE_BATCH_TOPK,
        "cosine_kernel_pairs": _ORACLE_KERNEL_PAIRS,
        "point_lookup": _ORACLE_POINT_LOOKUP,
        "collections_catalog": _ORACLE_CATALOG,
        "ingest_embed": _ORACLE_INGEST,
        "dedup_exact": _ORACLE_DEDUP_EXACT,
    }
