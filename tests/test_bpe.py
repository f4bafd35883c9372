"""Distributed BPE training (operators/bpe.py) vs the Python reference."""

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import bpe

_CORPUS = [
    "low low low low low",
    "lower lower newer newer newer newer",
    "newest newest newest widest widest",
    None,
]


def _df(spark, texts=None):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts or _CORPUS)],
        "doc_id long, text string")


def test_merges_match_python_reference(spark):
    got = bpe.bpe_train(_df(spark), "text", num_merges=8)
    want = bpe.bpe_train_py(_CORPUS, num_merges=8)
    assert got == want
    assert len(got) == 8
    # the classic corpus learns e+r</w> style merges; spot-check shape
    assert all(isinstance(l, str) and isinstance(r, str) for l, r in got)


def test_merges_invariant_under_repartition(spark):
    df = _df(spark)
    assert (bpe.bpe_train(df, "text", 5)
            == bpe.bpe_train(df.repartition(7), "text", 5))


def test_min_pair_count_stops_early(spark):
    df = _df(spark, ["ab", "cd", "ef"])  # every pair occurs once
    assert bpe.bpe_train(df, "text", 5, min_pair_count=2) == []


def test_empty_and_null_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe.bpe_train(empty, "text", 3) == []
    assert bpe.bpe_train(_df(spark, [None, None]), "text", 3) == []


def test_encode_reconstructs_word(spark):
    merges = bpe.bpe_train(_df(spark), "text", 10)
    for w in ("lowest", "newer", "low"):
        toks = bpe.bpe_encode_py(w, merges)
        assert "".join(toks) == w + bpe.EOW
        assert len(toks) <= len(w) + 1


def test_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a) must become [aa, a] — greedy
    left-to-right, matching every standard implementation."""
    df = _df(spark, ["aaa aaa aaa"])
    merges = bpe.bpe_train(df, "text", 1)
    assert merges == [("a", "a")]
    assert bpe.bpe_encode_py("aaa", merges) == ["aa", "a", bpe.EOW]


def test_iteration_runs_on_vocab_not_corpus(spark):
    """Exact-copy duplication changes counts, never the vocabulary —
    the learned merges must be identical, demonstrating the iterations
    are corpus-size-invariant after the one word-count scan."""
    base = [t for t in _CORPUS if t]
    assert (bpe.bpe_train(_df(spark, base), "text", 6)
            == bpe.bpe_train(_df(spark, base * 7), "text", 6))


def test_pair_argmax_plan_is_top_k(spark):
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    vocab = (bpe.word_counts(_df(spark), "text")
             .select(bpe._initial_symbols(F.col("word")).alias("syms"),
                     "n"))
    plan = formatted_plan(
        bpe.pair_counts(vocab)
        .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right")).limit(1))
    assert "TakeOrderedAndProject" in plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct"):
        assert node not in plan


def test_segment_matches_python_encode(spark):
    """bpe_segment's per-document tokens equal the word-by-word Python
    encoding concatenated in document order."""
    import re

    from go_simple_embedding_database_spark.functions.text import (
        lower_x_py)

    merges = bpe.bpe_train(_df(spark), "text", 6)
    out = {r.doc_id: (list(r.tokens), r.n_tokens)
           for r in bpe.bpe_segment(_df(spark), "doc_id", "text",
                                    merges).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i, t in enumerate(_CORPUS):
        if t is None:
            assert out[i] == ([], 0)
            continue
        want = []
        for w in re.split(r"\s+", lower_x_py(t), flags=re.ASCII):
            if w:
                want.extend(bpe.bpe_encode_py(w, merges))
        assert out[i] == (want, len(want)), (i, out[i], want)


def test_segment_plan_is_broadcast_join_no_python(spark):
    """The dictionary must broadcast; the corpus-sized path has no
    Python nodes and no sort-merge shuffle for the vocabulary join."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    merges = bpe.bpe_train(_df(spark), "text", 3)
    plan = formatted_plan(
        bpe.bpe_segment(_df(spark), "doc_id", "text", merges))
    assert "BroadcastHashJoin" in plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct",
                 "SortMergeJoin"):
        assert node not in plan


def test_segment_with_no_merges_is_character_segmentation(spark):
    out = {r.doc_id: list(r.tokens)
           for r in bpe.bpe_segment(_df(spark, ["ab b"]), "doc_id",
                                    "text", []).collect()}
    assert out[0] == ["a", "b", bpe.EOW, "b", bpe.EOW]


def test_train_pins_at_most_two_supersteps(spark):
    """ADVICE r08: the merge loop chains one lazy localCheckpoint per
    iteration; without explicit release all K vocabulary snapshots stay
    pinned in executor storage (DataFrame.unpersist is a no-op on
    checkpoint blocks — they live on the RDD, not in the CacheManager).
    bpe_train now frees each superstep via release_local_checkpoint as
    soon as its successor materializes, so training K merges must leave
    the persistent-RDD census where it started."""
    sc = spark.sparkContext
    base = set(sc._jsc.getPersistentRDDs().keySet())
    merges = bpe.bpe_train(_df(spark), "text", 8)
    assert len(merges) >= 4  # the loop genuinely iterated
    now = set(sc._jsc.getPersistentRDDs().keySet())
    leaked = now - base
    assert not leaked, f"training left {len(leaked)} checkpoint RDDs pinned"


def test_release_local_checkpoint_frees_blocks_and_is_safe(spark):
    from go_simple_embedding_database_spark.plans.checkpoints import (
        release_local_checkpoint)
    sc = spark.sparkContext
    base = set(sc._jsc.getPersistentRDDs().keySet())
    df = spark.range(100).selectExpr("id", "id * 2 AS y") \
        .localCheckpoint(eager=True)
    assert set(sc._jsc.getPersistentRDDs().keySet()) - base
    assert release_local_checkpoint(df) is True
    assert not (set(sc._jsc.getPersistentRDDs().keySet()) - base)
    # non-checkpointed frames are a harmless no-op
    assert release_local_checkpoint(spark.range(5)) is False


def test_segment_broadcast_and_shuffle_paths_agree(spark):
    """VERDICT r08 #5: above the vocabulary knob the dictionary join
    falls back from broadcast to a shuffled join — same results. Force
    both paths over the same corpus and merges; also exercise the auto
    knob's fallback decision (limit=1 forces the shuffle path)."""
    merges = bpe.bpe_train(_df(spark), "text", 5)
    args = (_df(spark), "doc_id", "text", merges)
    rows = lambda df: sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens) for r in df.collect())
    b = rows(bpe.bpe_segment(*args, broadcast_vocab=True))
    s = rows(bpe.bpe_segment(*args, broadcast_vocab=False))
    auto_small = rows(bpe.bpe_segment(*args, broadcast_vocab_limit=1))
    assert b == s == auto_small
    assert len(b) == 4 and any(n > 0 for _, _, n in b)


def test_segment_shuffle_path_plan_has_no_broadcast_of_dictionary(spark):
    """The fallback must genuinely shuffle: no BroadcastHashJoin for the
    word join (SortMergeJoin or shuffled hash join instead), still zero
    Python and no cartesian blowup."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    merges = bpe.bpe_train(_df(spark), "text", 3)
    plan = formatted_plan(
        bpe.bpe_segment(_df(spark), "doc_id", "text", merges,
                        broadcast_vocab=False))
    assert "BroadcastHashJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    for node in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct"):
        assert node not in plan


def test_on_superstep_hook_observes_two_pinned_invariant(spark):
    """The on_superstep hook (round 10, the deep-merge probe's
    observation point) fires once per learned merge, right after the
    predecessor release — the persistent-RDD census there must never
    exceed baseline + 2 (current superstep + the one being declared),
    and training still returns the census to baseline."""
    sc = spark.sparkContext
    base = len(sc._jsc.getPersistentRDDs().keySet())
    deltas = []

    def hook(i):
        deltas.append(len(sc._jsc.getPersistentRDDs().keySet()) - base)

    merges = bpe.bpe_train(_df(spark), "text", 6, on_superstep=hook)
    assert len(deltas) == len(merges) >= 4  # fired once per merge
    assert max(deltas) <= 2, deltas
    assert len(sc._jsc.getPersistentRDDs().keySet()) == base
