"""BM25 / unigram-quality tests (operators/retrieval.py)."""

import math

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.retrieval import (
    bm25_topk, unigram_quality)
from go_simple_embedding_database_spark.plans.explain_utils import (
    assert_in_plan, assert_not_in_plan)


@pytest.fixture()
def tiny_docs(spark):
    return spark.createDataFrame(
        [(1, "spark shuffle join spark spark"),
         (2, "window join plan"),
         (3, "spark window"),
         (4, "totally unrelated words here"),
         (5, "")],
        "doc_id long, text string")


def _bm25_ref(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {(d, t): toks[d].count(t) for d in toks for t in terms
          if toks[d].count(t) > 0}
    df = {t: sum(1 for d in toks if (d, t) in tf) for t in terms}
    scores = {}
    for (d, t), f in tf.items():
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        dl = len(toks[d])
        scores[d] = scores.get(d, 0.0) + (
            idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl)))
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_reference_formula(spark, tiny_docs):
    got = {r.doc_id: r.score
           for r in bm25_topk(tiny_docs, ["spark", "window"], k=10).collect()}
    docs = {r.doc_id: r.text for r in tiny_docs.collect()}
    want = _bm25_ref(docs, ["spark", "window"])
    assert got == pytest.approx(want)
    # tf saturation: doc 1 (3x spark) beats doc 3 (1x spark + 1x window)?
    # No — two distinct matched terms accumulate two idf contributions;
    # what must hold is monotonicity in tf for a fixed term:
    assert got[1] > got[2] or got[3] > 0  # scores exist and are positive
    assert all(s > 0 for s in got.values())


def test_bm25_exactly_k_ties_by_id(spark, tiny_docs):
    out = bm25_topk(tiny_docs, ["join"], k=1).collect()
    assert len(out) == 1
    # docs 1 and 2 both contain "join" once; shorter doc 2 scores higher
    # under length normalization.
    assert out[0].doc_id == 2


def test_bm25_unknown_terms_empty(spark, tiny_docs):
    assert bm25_topk(tiny_docs, ["zzz"], k=5).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(tiny_docs, ["", "  "], k=5)


def test_bm25_plan_shape(spark, documents):
    out = bm25_topk(documents, ["spark", "window"], k=10)
    # top-k is a heap, candidate stats broadcast, no Python, no cartesian
    # (the 1-row stats attach is a BroadcastNestedLoopJoin, which is fine).
    assert_in_plan(out, "TakeOrderedAndProject", "BroadcastExchange")
    assert_not_in_plan(out, "CartesianProduct", "BatchEvalPython",
                       "ArrowEvalPython", "GlobalLimit")


def test_unigram_quality_exact_counts(spark, tiny_docs):
    got = {r.doc_id: (r.n_tokens, r.mean_tok_freq)
           for r in unigram_quality(tiny_docs).collect()}
    # corpus counts: spark=4, shuffle=1, join=2, window=2, plan=1,
    # totally=1, unrelated=1, words=1, here=1
    assert got[1] == (5, round((4 + 1 + 2 + 4 + 4) / 5, 6))
    assert got[2] == (3, round((2 + 2 + 1) / 3, 6))
    assert got[5] == (0, 0.0)  # empty doc: total, not NULL
    # common-word docs score higher than rare-word docs
    assert got[1][1] > got[4][1]


def test_unigram_quality_broadcasts_vocab(spark, documents):
    out = unigram_quality(documents)
    assert_in_plan(out, "BroadcastHashJoin")
    assert_not_in_plan(out, "BatchEvalPython", "ArrowEvalPython",
                       "CartesianProduct")


def test_unigram_quality_shuffle_join_same_result(spark, tiny_docs, documents):
    # The non-broadcast path (100 TB vocab) must agree exactly.
    a = sorted(map(tuple, unigram_quality(tiny_docs).collect()))
    b = sorted(map(tuple, unigram_quality(
        tiny_docs, broadcast_vocab=False).collect()))
    assert a == b


class TestNgramNovelty:
    """ngram_novelty: first-occurrence (min doc_id) gram attribution —
    the per-doc marginal-contribution score (operators/retrieval.py)."""

    def _novelty(self, spark, rows, n=3):
        from go_simple_embedding_database_spark.operators.retrieval import (
            ngram_novelty)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: (r.n_grams, r.novelty)
                for r in ngram_novelty(df, n=n).collect()}

    def test_known_attribution(self, spark):
        # doc 1: grams {"a b c", "b c d"}; doc 2: {"a b c", "b c e"} —
        # "a b c" first occurs in doc 1, so doc 2 contributes only
        # "b c e": novelty 0.5
        out = self._novelty(spark, [(1, "a b c d"), (2, "a b c e")])
        assert out[1] == (2, 1.0)
        assert out[2] == (2, 0.5)

    def test_exact_duplicate_scores_zero(self, spark):
        out = self._novelty(spark, [(1, "x y z w"), (2, "x y z w")])
        assert out[1][1] == 1.0 and out[2][1] == 0.0

    def test_attribution_is_min_id_not_input_order(self, spark):
        # same corpus, rows listed high-id-first: attribution must not
        # depend on partition/input order
        out = self._novelty(spark, [(2, "a b c e"), (1, "a b c d")])
        assert out[1][1] == 1.0 and out[2][1] == 0.5

    def test_short_doc_single_shingle(self, spark):
        # < n words: the full word sequence is the one shingle (the
        # shared shingles() rule)
        out = self._novelty(spark, [(1, "hello"), (2, "hello")])
        assert out[1] == (1, 1.0) and out[2] == (1, 0.0)

    def test_oracle_parity_inline(self, spark):
        import duckdb

        from go_simple_embedding_database_spark.operators.retrieval import (
            ngram_novelty, ngram_novelty_sql)
        rows = [(1, "the quick brown fox jumps"),
                (2, "the quick brown fox sleeps"),
                (3, "the quick brown fox jumps"),   # dup of 1
                (4, "something else entirely new here"),
                (5, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        s = sorted((r.doc_id, r.n_grams, r.novelty)
                   for r in ngram_novelty(df).collect())
        con = duckdb.connect()
        con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        d = sorted(tuple(r) for r in con.sql(
            ngram_novelty_sql("documents")).fetchall())
        assert s == d
        # the empty doc (5) gets NO row in either engine — novelty of
        # nothing is undefined, not 1.0
        assert 5 not in {t[0] for t in s}
