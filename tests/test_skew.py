"""Skew operators: salted aggregation / replicated join correctness."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key."""
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return df.cache()


def test_key_histogram_finds_hot_key(spark, skewed):
    top = skew.key_histogram(skewed, "k", top=1).collect()
    assert top[0].k == "hot" and top[0].n_rows == 900


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {(r.k, r.n, round(r.s, 6)) for r in
             skewed.groupBy("k").agg(F.count("*").alias("n"),
                                     F.sum("v").alias("s")).collect()}
    salted = {(r.k, r.n, round(r.s, 6)) for r in
              skew.salted_aggregate(
                  skewed, "k",
                  {"n": F.count("*"), "s": F.sum("v")},
                  {"n": F.sum("n"), "s": F.sum("s")}).collect()}
    assert salted == plain


def test_salted_aggregate_spreads_hot_key(spark, skewed):
    """Phase 1 must produce multiple rows for the hot key — the proof the
    reduce-side task for 'hot' was split."""
    phase1 = (skew.with_salt(skewed, 16).groupBy("k", "_salt")
              .agg(F.count("*").alias("n")))
    assert phase1.filter(F.col("k") == "hot").count() > 1


def test_replicated_skew_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k950", "A"), ("k999", "B")], "k string, tag string")
    plain = {(r.k, r.v, r.tag) for r in skewed.join(dim, "k").collect()}
    repl = {(r.k, r.v, r.tag) for r in
            skew.replicated_skew_join(skewed, dim, "k", salts=8).collect()}
    assert repl == plain
    assert len(plain) == 902


def test_replicated_skew_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, tag string")
    out = skew.replicated_skew_join(skewed, dim, "k", salts=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("tag").isNull()).count() == 100
