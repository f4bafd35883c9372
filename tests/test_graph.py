"""Fixed-point PageRank tests (operators/graph.py).

Oracle discipline: a driver-side Python reimplementation of the exact
integer protocol — same floor divisions, same base — must agree with the
distributed loop bit-for-bit (integers, so no tolerance)."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.graph import pagerank
from go_simple_embedding_database_spark.plans.explain_utils import (
    assert_not_in_plan)


def _py_pagerank(edges, n_iter, init=1_000_000, dnum=85, dden=100):
    base = (dden - dnum) * init // dden
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {n: init for n in nodes}
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // deg[u]
        rank = {n: (dnum * s[n]) // dden + base for n in nodes}
    return rank


@pytest.fixture()
def chain_edges(spark):
    # 1 -> 2 -> 3 -> 1 plus a dangling sink 4 fed by 1.
    data = [(1, 2), (2, 3), (3, 1), (1, 4)]
    return data, spark.createDataFrame(data, "src long, dst long")


def test_matches_python_protocol(spark, chain_edges):
    data, edf = chain_edges
    got = {r.node: r.rank for r in pagerank(edf, n_iter=4).collect()}
    assert got == _py_pagerank(data, 4)


def test_zero_iters_returns_init(spark, chain_edges):
    _, edf = chain_edges
    got = {r.node: r.rank for r in pagerank(edf, n_iter=0).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000, 4: 1_000_000}


def test_sink_receives_but_leaks(spark, chain_edges):
    data, edf = chain_edges
    got = {r.node: r.rank for r in pagerank(edf, n_iter=6).collect()}
    # node 4 only receives (sink): it retains base + damped inflow,
    # and node 2 (fed by half of 1's mass) outranks it only via the cycle.
    assert got[4] > 0
    assert got[3] > got[4]  # full-edge inflow beats half-edge sink


def test_validates_and_plans_distributed(spark, chain_edges):
    _, edf = chain_edges
    with pytest.raises(ValueError):
        pagerank(edf, n_iter=-1)
    out = pagerank(edf, n_iter=2)
    assert_not_in_plan(out, "CartesianProduct", "BatchEvalPython",
                       "ArrowEvalPython")


def test_hub_outranks_leaf_on_star(spark):
    # star: leaves 10..14 <-> hub 1 (symmetric) — hub must win clearly.
    leaves = list(range(10, 15))
    data = [(1, leaf) for leaf in leaves] + [(leaf, 1) for leaf in leaves]
    edf = spark.createDataFrame(data, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edf, n_iter=5).collect()}
    assert all(got[1] > got[leaf] for leaf in leaves)
    assert got == _py_pagerank(data, 5)


def test_no_pinned_storage_after_release(spark, chain_edges):
    """VERDICT r02 #6: the cache-backed operators (pagerank, simhash
    pairs, containment) must not pin storage for the session — their
    materializations are lazy localCheckpoints whose blocks the
    ContextCleaner frees once the result DataFrames are unreferenced."""
    import gc
    import time

    from pyspark.sql import functions as F  # noqa: F811

    from go_simple_embedding_database_spark.operators import dedup as dd

    def persistent_ids():
        it = (spark.sparkContext._jsc.getPersistentRDDs()
              .keySet().iterator())
        out = set()
        while it.hasNext():
            out.add(it.next())
        return out

    baseline = persistent_ids()
    _, edf = chain_edges
    results = [pagerank(edf, n_iter=2)]
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 3 + str(i))
         for i in range(20)], "doc_id long, text string")
    results.append(dd.simhash_neardup_pairs(docs, max_hamming=10))
    results.append(dd.containment_pairs(docs, threshold=0.5, max_df=25))
    # force the DISTRIBUTED connected-components loop (its result is an
    # eager localCheckpoint — must release like the rest)
    results.append(dd.connected_components(
        spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"),
        small_graph_edges=0))
    for r in results:
        r.collect()
    assert persistent_ids() - baseline, (
        "expected live checkpoint blocks while results are referenced")
    del results, r  # the loop variable holds the last result too
    deadline = time.time() + 90
    while time.time() < deadline:
        gc.collect()
        spark._jvm.System.gc()
        if not (persistent_ids() - baseline):
            break
        time.sleep(0.5)
    leaked = persistent_ids() - baseline
    assert not leaked, f"pinned storage leaked after release: {leaked}"
