"""Misra-Gries heavy hitters (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.sketch import frequent_items


def _tokens(spark, rows, partitions=8):
    return (spark.createDataFrame([(t,) for t in rows], "token string")
            .repartition(partitions))


def test_matches_naive_groupby_exactly(spark):
    """The sketch path must return EXACTLY the naive groupBy/HAVING
    answer: heavy items planted at 5% each, tail of singletons."""
    stream = (["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 150
              + [f"tail{i}" for i in range(2000)])
    toks = _tokens(spark, stream)
    got = {(r.token, r.n_occurrences)
           for r in frequent_items(toks, capacity=200,
                                   threshold_frac=0.01).collect()}
    n = len(stream)
    thresh = n * 0.01 // 1 + 1
    naive = {(r.token, r.n)
             for r in toks.groupBy("token").agg(F.count("*").alias("n"))
             .filter(F.col("n") >= thresh).collect()}
    assert got == naive
    assert ("alpha", 500) in got and not any(t.startswith("tail")
                                             for t, _ in got)


def test_heavy_item_spread_across_partitions_survives(spark):
    """A heavy item diluted evenly over many partitions must still be
    found — the mergeable-summaries property the per-partition sketch
    alone doesn't give."""
    # 64 copies of the heavy item interleaved with unique noise, spread
    # round-robin over 16 partitions => ~4 copies per partition amid noise
    stream = []
    for i in range(64):
        stream.append("needle")
        stream.extend(f"noise{i}_{j}" for j in range(30))
    toks = _tokens(spark, stream, partitions=16)
    got = {r.token for r in
           frequent_items(toks, capacity=100, threshold_frac=0.02).collect()}
    assert got == {"needle"}  # 64 / 1984 ≈ 3.2% > 2% threshold


def test_threshold_below_guarantee_raises(spark):
    toks = _tokens(spark, ["a", "b"])
    with pytest.raises(ValueError, match="Misra-Gries guarantee"):
        frequent_items(toks, capacity=10, threshold_frac=0.01)  # < 1/11
