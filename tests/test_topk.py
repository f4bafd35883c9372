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
