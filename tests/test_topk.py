"""Top-k operator semantics + physical-plan contract (SURVEY §2.3)."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.topk import (
    batch_topk,
    similarity_join,
    topk_by_similarity,
)
from go_simple_embedding_database_spark.plans.explain_utils import formatted_plan


def test_topk_self_match_first(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") == 0).collect()[0].embedding
    out = topk_by_similarity(embeddings, list(q), 5, score_col="sim",
                             tie_break=["vec_id"]).collect()
    assert out[0].vec_id == 0
    assert out[0].sim == pytest.approx(1.0)
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_topk_small_input_returns_all(spark, embeddings):
    small = embeddings.filter(F.col("vec_id") < 3)
    q = embeddings.filter(F.col("vec_id") == 0).collect()[0].embedding
    assert topk_by_similarity(small, list(q), 10).count() == 3


def test_topk_plans_take_ordered(spark, embeddings):
    """The 100 TB contract: top-k must compile to TakeOrderedAndProject
    (per-partition heaps), NOT a global Sort."""
    q = embeddings.limit(1).collect()[0].embedding
    df = topk_by_similarity(embeddings, list(q), 5)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_batch_topk_exact_k_per_query(spark, embeddings):
    queries = (embeddings.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_embedding")))
    out = batch_topk(embeddings, queries, 4, tie_break=["vec_id"])
    counts = {r.query_id: r.n for r in
              out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 4, 1: 4, 2: 4}
    # self-match ranks first for each query
    firsts = out.filter(F.col("vec_id") == F.col("query_id"))
    assert firsts.count() == 3


def test_batch_topk_broadcasts_queries(spark, embeddings):
    queries = (embeddings.limit(3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_embedding")))
    df = batch_topk(embeddings, queries, 2)
    assert "BroadcastNestedLoopJoin" in formatted_plan(df) or "BroadcastExchange" in formatted_plan(df)


def test_similarity_join_threshold_and_k(spark, embeddings):
    left = embeddings.filter(F.col("vec_id") < 5)
    out = similarity_join(left, embeddings, k=3, left_id="vec_id", right_id="vec_id")
    assert out.groupBy("left_id").count().filter("count != 3").count() == 0
    # self-pair present with sim ~1
    selfs = out.filter(F.col("left_id") == F.col("right_id"))
    assert selfs.count() == 5


def test_similarity_join_threshold_only(spark, embeddings):
    left = embeddings.filter(F.col("vec_id") < 5)
    out = similarity_join(left, embeddings, threshold=0.999999,
                          left_id="vec_id", right_id="vec_id")
    # at minimum the self-pairs survive a ~1.0 threshold
    assert out.filter(F.col("left_id") == F.col("right_id")).count() == 5


def test_batch_topk_record_scorer_bitwise_parity(spark, embeddings,
                                                 monkeypatch):
    """Round-11 record-form scorer (SPARK_GRAFT_BATCH_SCORER=record, the
    §8 move-heavy-bytes-once shape): the slim scored relation is
    bit-identical to the pair form over EVERY (record, query) pair —
    including NULL vectors, NULL elements (NaN per the kernel contract),
    length mismatches and zero norms — and the winners match. Default
    stays the pair form (plan unchanged); record mode plans MapInPandas
    and no cross join before the window."""
    import struct

    from go_simple_embedding_database_spark.functions.kernels import (
        cosine_pairs_kernel)
    from go_simple_embedding_database_spark.operators.topk import (
        _record_form_scores, batch_topk)

    base = embeddings.select("vec_id", F.col("embedding")
                             .cast("array<double>").alias("embedding"))
    weird = spark.createDataFrame(
        [(90001, None), (90002, [1.0, None, 2.0]),
         (90003, [0.0, 0.0, 0.0]), (90004, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    records = base.unionByName(weird)
    queries = (base.filter(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_embedding"))
               .unionByName(spark.createDataFrame(
                   [(80001, None), (80002, [1.0, 0.0])],
                   "query_id long, query_embedding array<double>")))

    def b(x):
        return None if x is None else struct.pack("<d", x)

    monkeypatch.delenv("SPARK_GRAFT_BATCH_SCORER", raising=False)
    pair = {(r.query_id, r.vec_id): b(r.s) for r in
            records.crossJoin(F.broadcast(queries)).select(
                "query_id", "vec_id",
                cosine_pairs_kernel(F.col("embedding"),
                                    F.col("query_embedding")).alias("s"))
            .collect()}
    rec_slim = _record_form_scores(
        records, queries, "embedding", "query_embedding", "query_id",
        "vec_id", "s", [])
    rec = {(r.query_id, r.vec_id): b(r.s) for r in rec_slim.collect()}
    assert rec == pair and len(rec) == records.count() * queries.count()

    # end-to-end winners + dispatch plan shape
    pw = sorted(map(tuple, batch_topk(
        records, queries, 3, score_col="sim", tie_break=["vec_id"],
        records_id="vec_id").select("query_id", "vec_id", "sim")
        .collect()))
    monkeypatch.setenv("SPARK_GRAFT_BATCH_SCORER", "record")
    rdf = batch_topk(records, queries, 3, score_col="sim",
                     tie_break=["vec_id"], records_id="vec_id")
    rw = sorted(map(tuple, rdf.select("query_id", "vec_id", "sim")
                    .collect()))
    plan = formatted_plan(rdf)
    assert "MapInPandas" in plan
    assert [(a, c, b(s)) for a, c, s in pw] == \
           [(a, c, b(s)) for a, c, s in rw]
