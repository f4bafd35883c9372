"""Temperature mixture sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import sampling as sp


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "big") for i in range(400)] + \
           [(400 + i, "small") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_rates_upweight_small_domains(corpus):
    """alpha=0.5 weights by sqrt(n): the small domain gets a larger share
    than its corpus proportion (100/500=20% of rows but sqrt gives
    10/30=33% of the budget)."""
    rates = {r.source: r for r in
             sp.temperature_rates(corpus, "source", 0.5, 300).collect()}
    assert rates["big"].n_docs == 400 and rates["small"].n_docs == 100
    # weights 20000 : 10000 → targets 200 : 100
    assert rates["big"].target_n == 200
    assert rates["small"].target_n == 100
    assert all(r.rate_10k <= sp.HASH_MOD for r in rates.values())


def test_target_capped_at_domain_size(corpus):
    """A budget larger than the corpus caps every target at n_docs
    (rate_10k = 10000 = keep everything)."""
    rates = {r.source: r for r in
             sp.temperature_rates(corpus, "source", 0.5, 10_000).collect()}
    assert rates["big"].target_n == 400
    assert rates["small"].target_n == 100
    assert rates["small"].rate_10k == sp.HASH_MOD


def test_sample_deterministic_subset(corpus):
    """The sample is a deterministic subset: same rows both runs, every
    row from the corpus, membership decided by the md5 threshold."""
    s1 = sorted(r.doc_id for r in
                sp.temperature_sample(corpus, "source", "doc_id").collect())
    s2 = sorted(r.doc_id for r in
                sp.temperature_sample(corpus, "source", "doc_id").collect())
    assert s1 == s2 and len(s1) > 0
    all_ids = {r.doc_id for r in corpus.collect()}
    assert set(s1) <= all_ids


def test_report_counts_consistent(corpus):
    """sampled_n in the report equals the actual sample's per-domain
    count; achieved is within hash-granularity of target (rate rounds up,
    bucket distribution is uneven at small n)."""
    rep = {r.source: r for r in
           sp.mixture_report(corpus, "source", "doc_id").collect()}
    counts = {r.source: r.cnt for r in
              sp.temperature_sample(corpus, "source", "doc_id")
              .groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for s, row in rep.items():
        assert counts.get(s, 0) == row.sampled_n
        assert row.sampled_n <= row.n_docs


def test_rates_match_duckdb_on_skewed_counts(spark):
    """Cross-engine regression (review finding): the oracle must apply
    the SAME integer weight quantization as the Spark side — raw double
    pow-sums diverge at floor boundaries on non-uniform domain counts
    (e.g. [2207, 3942] gave 107 vs 106)."""
    import duckdb

    rows = [(i, "a") for i in range(2207)] + \
           [(10000 + i, "b") for i in range(3942)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {r.source: (r.n_docs, r.target_n, r.rate_10k) for r in
           sp.temperature_rates(df, "source", 0.5, 250).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t (doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, "a") for i in range(2207)] +
                    [(10000 + i, "b") for i in range(3942)])
    sql = sp.temperature_sample_sql("t", "source", "doc_id",
                                    alpha=0.5, budget=250)
    want = {r[0]: (r[1], r[2], None) for r in
            con.sql(sql).fetchall()}
    for s in ("a", "b"):
        assert got[s][:2] == want[s][:2], (s, got[s], want[s])


# -- budget_select (token-budget prefix) ---------------------------------------

@pytest.fixture(scope="module")
def costed(spark):
    """Skewed keys with heavy ties (many rows share a key, so band
    boundaries and tiebreaks are both exercised) and lumpy costs."""
    rows = [(i, (i * 7) % 50 + (i % 3) * 40, (i * i) % 90 + 1)
            for i in range(300)]
    return spark.createDataFrame(rows, "id bigint, key bigint, cost bigint")


def _naive_prefix(df, budget):
    from pyspark.sql import Window
    w = (Window.orderBy(F.col("key").desc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return {r.id for r in df.withColumn("_c", F.sum("cost").over(w))
            .filter(F.col("_c") <= budget).collect()}


@pytest.mark.parametrize("budget", [0, 1, 500, 4000, 10**9])
def test_budget_select_equals_naive_prefix(costed, budget):
    """The histogram refinement must equal the naive global-window prefix
    at every boundary regime: empty take, single-row take, mid-corpus
    boundary, and budget beyond the total (take everything)."""
    got = {r.id for r in
           sp.budget_select(costed, "id", "key", "cost", budget,
                            bucket_width=16).collect()}
    assert got == _naive_prefix(costed, budget)


def test_budget_select_bucket_width_invariant(costed):
    """The band width is a physical knob, not a semantic one: any width
    yields the same selected set."""
    want = _naive_prefix(costed, 3000)
    for w in (1, 7, 64, 10_000):
        got = {r.id for r in
               sp.budget_select(costed, "id", "key", "cost", 3000,
                                bucket_width=w).collect()}
        assert got == want, w


def test_budget_select_keeps_payload_columns(spark):
    df = spark.createDataFrame(
        [(1, 10, 5, "x"), (2, 20, 5, "y"), (3, 30, 5, "z")],
        "id bigint, key bigint, cost bigint, payload string")
    out = sp.budget_select(df, "id", "key", "cost", 10)
    assert set(out.columns) == {"id", "key", "cost", "payload"}
    assert {(r.id, r.payload) for r in out.collect()} == {(3, "z"), (2, "y")}


class TestWeightedSample:
    def test_exact_k_per_group_and_determinism(self, spark, documents):
        from go_simple_embedding_database_spark.operators.sampling import (
            weighted_sample)
        out = weighted_sample(documents, k=5, weight_col="n_chars",
                              group_cols=("source",))
        counts = {r.source: r.n for r in
                  out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert all(n == 5 for n in counts.values())
        # deterministic under a different partitioning
        again = weighted_sample(documents.repartition(7), k=5,
                                weight_col="n_chars", group_cols=("source",))
        assert (sorted(map(tuple, out.collect()))
                == sorted(map(tuple, again.collect())))

    def test_weight_dominance_and_exclusions(self, spark):
        from go_simple_embedding_database_spark.operators.sampling import (
            weighted_sample)
        rows = [(i, 1.0) for i in range(50)] + [(100, 1e9), (101, 0.0),
                                                (102, None)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = weighted_sample(df, k=3, weight_col="w", id_col="doc_id")
        ids = {r.doc_id for r in out.collect()}
        assert 100 in ids          # ~certain under -ln(u)/1e9
        assert 101 not in ids and 102 not in ids  # zero/NULL excluded
        assert len(ids) == 3

    def test_global_case_is_heap_not_sort(self, spark, documents):
        from go_simple_embedding_database_spark.operators.sampling import (
            weighted_sample)
        from go_simple_embedding_database_spark.plans.explain_utils import (
            assert_in_plan)
        out = weighted_sample(documents, k=7, weight_col="n_chars")
        assert_in_plan(out, "TakeOrderedAndProject")
        assert out.count() == 7

    def test_validates_k(self, spark, documents):
        from go_simple_embedding_database_spark.operators.sampling import (
            weighted_sample)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            weighted_sample(documents, k=0, weight_col="n_chars")


def test_budget_select_excludes_null_key_and_cost(spark):
    """Rows with NULL key or NULL cost are excluded (no priority /
    nothing to budget) instead of crashing the driver-side band cumsum
    on a NULL bucket (tools/null_probe.py finding)."""
    df = spark.createDataFrame(
        [(1, 30, 5), (2, 20, 5), (3, None, 5), (4, 10, None), (5, 10, 5)],
        "id bigint, key bigint, cost bigint")
    got = {r.id for r in
           sp.budget_select(df, "id", "key", "cost", 15).collect()}
    assert got == {1, 2, 5}
