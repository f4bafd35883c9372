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


def test_partition_balance_canary_headline_shuffles(spark, sf_dir):
    """The 100x-shape smoke (VERDICT round-1 item 8): the two headline
    shuffle keys, hash-partitioned at a forced-high count, must show no
    partition reading >2x the mean — the local stand-in for the cluster
    straggler check."""
    from go_simple_embedding_database_spark.operators.dedup import lsh_bands

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bands = lsh_bands(docs, "text", "doc_id", num_hashes=12, bands=4)
    parts = skew.suggest_partitions(bands.count())
    b = skew.partition_balance(bands, ["band", "key"], parts)
    assert b["max_over_mean"] < 2.0, b

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = skew.partition_balance(
        skew.with_salt(events, 16), ["user_id", "_salt"],
        skew.suggest_partitions(events.count()))
    assert salted["max_over_mean"] < 2.0, salted


def test_partition_balance_detects_planted_skew(spark):
    """Sanity: a hot key must trip the canary (otherwise the <2 assertions
    above prove nothing)."""
    hot = spark.range(0, 2000).select(
        F.when(F.col("id") < 1500, F.lit("hot")).otherwise(
            F.col("id").cast("string")).alias("k"))
    b = skew.partition_balance(hot, ["k"], 64)
    assert b["max_over_mean"] > 2.0, b
