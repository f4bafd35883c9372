"""Sequence packing: bin assignment semantics + shuffle-count plan check."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.packing import (
    assign_pack_bins, pack_summary)


@pytest.fixture(scope="module")
def corpus(spark):
    # Token counts (TOKEN_REGEX): "a b c" -> 3 (+1 sep = 4), etc.
    rows = [
        (0, "s0", "a b c"),          # 4 tokens with sep
        (1, "s0", "d e"),            # 3
        (2, "s0", "f g h i j"),      # 6
        (3, "s0", "k"),              # 2
        (10, "s1", "one two three four five six seven"),  # 8
        (11, "s1", "eight nine"),    # 3
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_assign_pack_bins_offsets_and_bins(spark, corpus):
    out = {r.doc_id: r for r in assign_pack_bins(
        corpus, capacity=8, partition_cols=["source"]).collect()}
    # s0 stream: doc0 [0,4), doc1 [4,7), doc2 [7,13), doc3 [13,15)
    assert (out[0].start_token, out[0].bin, out[0].spans_bins) == (0, 0, 1)
    assert (out[1].start_token, out[1].bin) == (4, 0)
    # doc2 starts in bin 0 (token 7) and spills into bin 1 (ends at 12)
    assert (out[2].start_token, out[2].bin, out[2].spans_bins) == (7, 0, 2)
    assert (out[3].start_token, out[3].bin) == (13, 1)
    # s1 packs independently: doc10 starts its own stream at 0
    assert (out[10].start_token, out[10].bin) == (0, 0)
    assert (out[11].start_token, out[11].bin) == (8, 1)


def test_pack_summary_aggregates(spark, corpus):
    rows = {(r.source, r.bin): r for r in pack_summary(
        corpus, capacity=8, partition_cols=["source"]).collect()}
    s00 = rows[("s0", 0)]
    assert (s00.n_docs, s00.n_tokens, s00.first_doc, s00.last_doc) == (3, 13, 0, 2)
    s01 = rows[("s0", 1)]
    assert (s01.n_docs, s01.n_tokens) == (1, 2)
    assert rows[("s1", 0)].n_docs == 1 and rows[("s1", 1)].n_docs == 1


def test_pack_summary_single_shuffle(spark, corpus):
    """The groupBy keys extend the window's partition key, so the hash
    partitioning from the window shuffle satisfies the aggregation's
    clustering — exactly ONE exchange in the plan."""
    plan = pack_summary(corpus, capacity=8, partition_cols=["source"]
                        )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_capacity_validation(spark, corpus):
    with pytest.raises(ValueError, match="capacity"):
        assign_pack_bins(corpus, capacity=0)


def test_empty_text_still_pays_separator(spark):
    df = spark.createDataFrame([(0, "s", ""), (1, "s", "x")],
                               "doc_id long, source string, text string")
    out = {r.doc_id: r for r in assign_pack_bins(
        df, capacity=4, partition_cols=["source"]).collect()}
    assert out[0].n_tokens == 1          # 0 tokens + 1 separator
    assert out[1].start_token == 1
