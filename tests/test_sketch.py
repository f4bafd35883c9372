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


# -- Bloom-filter semi-join pruning --------------------------------------------

from go_simple_embedding_database_spark.operators.sketch import (  # noqa: E402
    bloom_build, bloom_might_contain, bloom_prune)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_bloom_has_no_false_negatives(spark):
    """The load-bearing invariant: every built key must probe positive —
    a false negative silently drops fact rows from the exact join."""
    keys = _keys(spark, list(range(0, 2000, 3)))
    probe = keys.crossJoin(F.broadcast(bloom_build(keys, "k")))
    n = probe.filter(bloom_might_contain(F.col("k"), F.col("bits"))).count()
    assert n == keys.count()


def test_bloom_false_positive_rate_within_sizing(spark):
    """Disjoint probe set: fp rate must respect the (1-e^(-kn/m))^k
    sizing (~0.2% at 667 keys / 16 Ki bits / 5 hashes; assert a lax
    2% so the bound, not the draw, is the contract)."""
    keys = _keys(spark, list(range(0, 2000, 3)))          # 667 keys
    probe = _keys(spark, list(range(1, 20000, 3)))        # disjoint
    hits = (probe.crossJoin(F.broadcast(bloom_build(keys, "k")))
            .filter(bloom_might_contain(F.col("k"), F.col("bits"))).count())
    assert hits / probe.count() < 0.02, hits


def test_bloom_prune_is_semantically_transparent(spark):
    """prune + exact join == plain join, exactly."""
    fact = spark.createDataFrame(
        [(i, i % 50) for i in range(3000)], "fid long, k long")
    keys = _keys(spark, [3, 7, 11, 13])
    pruned = bloom_prune(fact, keys, "k")
    exact = sorted(r.fid for r in pruned.join(keys, "k").collect())
    plain = sorted(r.fid for r in fact.join(keys, "k").collect())
    assert exact == plain and len(plain) == 4 * 60


def test_bloom_empty_key_set_prunes_everything(spark):
    keys = _keys(spark, []).filter("k IS NOT NULL")
    fact = spark.createDataFrame([(1,), (2,)], "k long")
    assert bloom_prune(fact, keys, "k").count() == 0


def test_bloom_null_keys_are_dropped_both_sides(spark):
    """NULL dim keys never enter the bitset; NULL fact keys probe to NULL
    and are filtered — matching equi-join semantics (NULL matches
    nothing)."""
    keys = spark.createDataFrame([(1,), (None,)], "k long")
    fact = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    got = [r.k for r in bloom_prune(fact, keys, "k").collect()]
    assert got == [1]


def test_bloom_rejects_unaligned_num_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(_keys(spark, [1]), "k", num_bits=100)


def test_bloom_string_keys(spark):
    """xxhash64 hashes any atomic type — string keys must work
    unchanged (the doc-id / URL dedup-pruning case)."""
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    fact = spark.createDataFrame([("a",), ("c",), ("b",), ("d",)],
                                 "k string")
    pruned = bloom_prune(fact, keys, "k")
    kept = {r.k for r in pruned.join(keys, "k").collect()}
    assert kept == {"a", "b"}

def test_bloom_mixed_integral_widths_have_no_false_negatives(spark):
    """ADVICE r07: xxhash64 is type-sensitive, so an int-keyed dim
    against a long-keyed fact used to hash to DIFFERENT positions and
    silently drop every matching row — a false negative. Canonicalization
    widens every integral width to long before hashing on BOTH sides, so
    the values an equi-join would match always probe positive."""
    fact = spark.createDataFrame(
        [(i, i % 50) for i in range(1000)], "fid long, k long")
    keys = spark.createDataFrame([(3,), (7,), (11,)], "k int")
    pruned = bloom_prune(fact, keys, "k", dim_key="k")
    exact = sorted(r.fid for r in
                   pruned.join(keys.withColumn("k", F.col("k").cast("long")),
                               "k").collect())
    plain = sorted(r.fid for r in
                   fact.join(keys.withColumn("k", F.col("k").cast("long")),
                             "k").collect())
    assert exact == plain and len(plain) == 3 * 20


def test_bloom_prune_rejects_cross_family_key_types(spark):
    """Key types SQL coercion would equate but xxhash64 hashes apart
    (string vs long, double vs long) must raise, never silently drop."""
    fact_l = spark.createDataFrame([(1,)], "k long")
    keys_s = spark.createDataFrame([("1",)], "k string")
    with pytest.raises(ValueError, match="hash differently"):
        bloom_prune(fact_l, keys_s, "k")
    keys_d = spark.createDataFrame([(1.0,)], "k double")
    with pytest.raises(ValueError, match="hash differently"):
        bloom_prune(fact_l, keys_d, "k")
