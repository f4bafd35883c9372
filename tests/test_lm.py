"""Bigram-LM perplexity scoring (operators/lm.py).

Oracle discipline: a driver-side pure-Python reimplementation of the
exact model (same tokenization via text.lower_x_py semantics, same
smoothing and interpolation) — the scored values must match to float
tolerance, the same independent-formulation standard as the k-means /
SemDeDup tests.
"""

import math

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.lm import (
    BigramLM, score_perplexity, train_bigram_lm)
from go_simple_embedding_database_spark.plans.explain_utils import (
    assert_not_in_plan)

REF_DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "a cat and a dog"),
]
CAND_DOCS = [
    (10, "the cat sat on the rug"),     # in-distribution
    (11, "zyx qwv jkl pqr"),            # all OOV gibberish
    (12, "the the the the"),            # common token, odd bigrams
    (13, ""),                           # nothing to score
]


def _py_tokens(t):
    return [w for w in t.lower().split() if w]


def _py_model(docs):
    uni, bi = {}, {}
    for _, t in docs:
        ws = _py_tokens(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi, sum(uni.values()), len(uni)


def _py_score(text, uni, bi, n, v, lam=0.7):
    ws = _py_tokens(text)
    if not ws:
        return None
    lps = []
    prev = None
    for w in ws:
        p_uni = (uni.get(w, 0) + 1.0) / (n + v + 1)
        if prev is None or prev not in uni:
            p = p_uni
        else:
            p = lam * bi.get((prev, w), 0) / uni[prev] + (1 - lam) * p_uni
        lps.append(math.log(p))
        prev = w
    return sum(lps) / len(lps)


@pytest.fixture(scope="module")
def lm(spark):
    return train_bigram_lm(
        spark.createDataFrame(REF_DOCS, "doc_id bigint, text string"))


def test_train_counts_match_python(spark, lm):
    uni, bi, n, v = _py_model(REF_DOCS)
    assert lm.n_tokens == n and lm.vocab_size == v
    assert {(r.token, r.n_uni) for r in lm.unigrams.collect()} == set(uni.items())
    assert {((r.prev, r.token), r.n_bi)
            for r in lm.bigrams.collect()} == set(bi.items())


def test_perplexity_matches_python_reference(spark, lm):
    uni, bi, n, v = _py_model(REF_DOCS)
    cand = spark.createDataFrame(CAND_DOCS, "doc_id bigint, text string")
    got = {r.doc_id: r for r in score_perplexity(cand, lm).collect()}
    for doc_id, text in CAND_DOCS:
        want = _py_score(text, uni, bi, n, v)
        if want is None:
            assert got[doc_id].avg_logprob is None
            assert got[doc_id].perplexity is None
            assert got[doc_id].n_tokens == 0
        else:
            assert got[doc_id].avg_logprob == pytest.approx(
                round(want, 6), abs=1e-6), doc_id
            assert got[doc_id].perplexity == pytest.approx(
                math.exp(-round(want, 6)), rel=1e-5), doc_id


def test_perplexity_ranks_gibberish_worst(spark, lm):
    cand = spark.createDataFrame(CAND_DOCS[:3], "doc_id bigint, text string")
    ppl = {r.doc_id: r.perplexity for r in score_perplexity(cand, lm).collect()}
    # in-distribution text scores best; all-OOV gibberish scores worst
    assert ppl[10] < ppl[12] < ppl[11]


def test_broadcast_and_shuffle_variants_agree(spark, lm):
    cand = spark.createDataFrame(CAND_DOCS, "doc_id bigint, text string")
    a = sorted(map(tuple, score_perplexity(
        cand, lm, broadcast_model=True).collect()))
    b = sorted(map(tuple, score_perplexity(
        cand, lm, broadcast_model=False).collect()))
    assert a == b


def test_scoring_plan_is_catalyst_only(spark, lm, documents):
    out = score_perplexity(documents.limit(50), lm)
    assert_not_in_plan(out, "CartesianProduct", "BatchEvalPython",
                       "ArrowEvalPython")


def test_empty_model_and_bad_lambda_raise(spark, lm):
    empty_docs = train_bigram_lm(
        lm.unigrams.sparkSession.createDataFrame([], "doc_id bigint, text string"))
    docs = lm.unigrams.sparkSession.createDataFrame(
        CAND_DOCS, "doc_id bigint, text string")
    with pytest.raises(ValueError):
        score_perplexity(docs, empty_docs)
    with pytest.raises(ValueError):
        score_perplexity(docs, lm, interpolation=1.0)


def test_model_merges_across_shards(spark):
    """Counts are mergeable summaries: training per shard and summing
    count relations equals training on the union — the property that
    lets a 100 TB reference corpus train in independent pieces."""
    shard_a = spark.createDataFrame(REF_DOCS[:2], "doc_id bigint, text string")
    shard_b = spark.createDataFrame(REF_DOCS[2:], "doc_id bigint, text string")
    la, lb = train_bigram_lm(shard_a), train_bigram_lm(shard_b)
    merged_uni = (la.unigrams.unionByName(lb.unigrams)
                  .groupBy("token").agg(F.sum("n_uni").alias("n_uni")))
    full = train_bigram_lm(
        spark.createDataFrame(REF_DOCS, "doc_id bigint, text string"))
    assert (sorted(map(tuple, merged_uni.collect()))
            == sorted(map(tuple, full.unigrams.collect())))
