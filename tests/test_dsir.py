"""DSIR importance-weighted selection (operators/dsir.py)."""

import math

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import dsir

# A corpus where the target distribution is unmistakable: target docs
# repeat one phrase, noise docs another; one straddler mixes both.
_TARGET = "alpha beta gamma delta alpha beta gamma delta alpha beta"
_NOISE = "zig zag zog zug zig zag zog zug zig zag"
_MIX = "alpha beta zig zag alpha beta zig zag alpha beta"


def _corpus(spark):
    rows = [
        (0, _TARGET, True), (1, _TARGET, True), (2, _NOISE, False),
        (3, _NOISE, False), (4, _MIX, False), (5, None, False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def _weights(spark):
    df = _corpus(spark)
    out = dsir.dsir_weights(df, "doc_id", "text", F.col("tgt"))
    return {r.doc_id: r for r in out.collect()}


def test_target_like_docs_outweigh_noise(spark):
    w = _weights(spark)
    assert w[0].weight_micro > w[4].weight_micro > w[2].weight_micro
    # identical text, identical weight — the features see text only
    assert w[0].weight_micro == w[1].weight_micro
    assert w[2].weight_micro == w[3].weight_micro


def test_null_text_doc_kept_with_zero_weight(spark):
    """A selector that drops unparseable docs corrupts the budget
    arithmetic — NULL text must survive as an explicit 0/0 row."""
    w = _weights(spark)
    assert set(w) == {0, 1, 2, 3, 4, 5}
    assert w[5].n_grams == 0 and w[5].weight_micro == 0


def test_blank_text_doc_matches_null_semantics(spark):
    """r10 blank-document convention: whitespace-only text yields zero
    grams in all three ngram_bag twins, so a blank doc sits at exactly
    the NULL doc's neutral prior — 0 grams, weight 0, kept in the
    corpus (the budget arithmetic must see it)."""
    rows = [(0, _TARGET, True), (1, _NOISE, False),
            (2, None, False), (3, "   \t\n ", False), (4, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {r.doc_id: r for r in
         dsir.dsir_weights(df, "doc_id", "text", F.col("tgt")).collect()}
    assert set(w) == {0, 1, 2, 3, 4}
    for d in (2, 3, 4):  # NULL, blank, empty — identical neutral rows
        assert w[d].n_grams == 0 and w[d].weight_micro == 0, (d, w[d])


def test_gram_counts_carry_multiplicity(spark):
    """ngram_bag is a BAG: a 10-word doc has 9 bigram occurrences even
    when most grams repeat (the distinct shingles would collapse them)."""
    w = _weights(spark)
    assert w[0].n_grams == 9
    assert w[4].n_grams == 9


def test_weight_matches_brute_force_lambda_sum(spark):
    """Recompute λ for every bucket the corpus touches with plain
    Python floats and compare the exact micro sums."""
    from go_simple_embedding_database_spark.functions.text import (
        lower_x_py)
    import hashlib

    docs = {0: _TARGET, 1: _TARGET, 2: _NOISE, 3: _NOISE, 4: _MIX}
    tgt_ids = {0, 1}
    B = dsir.DEFAULT_BUCKETS

    def grams(text):
        ws = lower_x_py(text).split()
        return [" ".join(ws[i:i + 2]) for i in range(max(len(ws) - 2, 0) + 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    ct, cr = {}, {}
    for d, t in docs.items():
        for g in grams(t):
            b = bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if d in tgt_ids:
                ct[b] = ct.get(b, 0) + 1
    Ct, Cr = sum(ct.values()), sum(cr.values())

    def lam_micro(b):
        lam = (math.log(ct.get(b, 0) + 1.0) - math.log(Ct + float(B))
               - math.log(cr.get(b, 0) + 1.0) + math.log(Cr + float(B)))
        return round(lam * dsir.LAMBDA_SCALE)

    expected = {d: sum(lam_micro(bucket(g)) for g in grams(t))
                for d, t in docs.items()}
    w = _weights(spark)
    for d, exp in expected.items():
        assert w[d].weight_micro == exp, (d, w[d].weight_micro, exp)


def test_select_budget_and_ordering(spark):
    """With a raw corpus dominated by noise (the DSIR regime — raw is
    crawl, target is small), target docs carry POSITIVE weights and are
    selected first; ties/ordering are (weight desc, doc_id asc)."""
    rows = ([(0, _TARGET, True), (1, _TARGET, True)]
            + [(10 + i, _NOISE, False) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir.dsir_select(df, "doc_id", "text", F.col("tgt"), budget=2)
    got = out.collect()
    assert [r.doc_id for r in got] == [0, 1]
    assert got[0].weight_micro > 0
    weights = [r.weight_micro for r in got]
    assert weights == sorted(weights, reverse=True)


def test_gramless_docs_rank_at_the_neutral_prior(spark):
    """A doc with no grams (NULL text) carries weight 0 — the neutral
    prior. In a degenerate corpus where every real doc is weakly
    negative it can therefore outrank them: documented behavior;
    production pipelines pre-filter empty docs through the quality
    gates (pipeline_clean_corpus) before selection."""
    w = _weights(spark)
    assert w[5].weight_micro == 0
    out = dsir.dsir_select(_corpus(spark), "doc_id", "text", F.col("tgt"),
                           budget=6)
    ordered = [r.doc_id for r in out.collect()]
    assert set(ordered) == {0, 1, 2, 3, 4, 5}
    weights = {r.doc_id: r.weight_micro
               for r in dsir.dsir_weights(_corpus(spark), "doc_id", "text",
                                          F.col("tgt")).collect()}
    assert ordered == sorted(weights, key=lambda d: (-weights[d], d))


def test_weights_invariant_under_repartition(spark):
    """The λ-micro quantization exists so per-doc sums are EXACT integer
    sums — partitioning must not move a single micro."""
    df = _corpus(spark)
    base = {r.doc_id: r.weight_micro for r in
            dsir.dsir_weights(df, "doc_id", "text", F.col("tgt")).collect()}
    shuf = {r.doc_id: r.weight_micro for r in
            dsir.dsir_weights(df.repartition(7), "doc_id", "text",
                              F.col("tgt")).collect()}
    assert base == shuf


def test_empty_corpus_selects_nothing(spark):
    df = spark.createDataFrame([], "doc_id long, text string, tgt boolean")
    assert dsir.dsir_select(df, "doc_id", "text", F.col("tgt"),
                            budget=10).count() == 0


def test_dsir_select_plan_is_top_k_not_sort(spark, documents):
    """Selection must be TakeOrderedAndProject (per-partition heaps) —
    a global Sort or a single-partition Window would collapse at scale.
    The λ join must broadcast the B-row bucket table."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    out = dsir.dsir_select(documents, "doc_id", "text",
                           F.col("lang") == "en", budget=100)
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
