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

# Queries whose implementation / oracle changes in round 7 — every one
# MUST sit inside the gate window so this round's CORRECTNESS file
# records it.
CHANGED_ROUND7 = {
    "gate_canary",            # gate-normalization canary, always first
    "approx_distinct_users",  # NULL-proof within_10pct verdict (ADVICE
                              # r06): both sides gate on n_exact > 0
    "pipeline_clean_corpus",  # affix-dedup stage added — the suffix-
                              # truncation engine now runs under a full
                              # composed plan (VERDICT r06 #6)
    # NEW round-7 queries — their FIRST official row must land:
    "bloom_prune_join",        # Bloom semi-join pruning (pure Catalyst)
    "approx_order_quantiles",  # bounded-rank-error percentile sketch
    "table_profile",           # one-pass ingest-audit column profile
    # freshness fill-in (implementation unchanged this round; its
    # family gains SCALE evidence — the prefix max_bucket sweep):
    "dedup_prefix",
}

# Round-7 rotation (standing policy, VERDICT r06 #1): these 43 queries'
# newest official CORRECTNESS row dates from r05 (they were the r06
# tail) — every one MUST sit inside the r07 window for a fresh row.
STALE_OFFICIAL_R05 = {
    "topk_cosine", "crud_query", "dedup_exact", "text_language_id",
    "dedup_minhash", "dedup_winnow", "dedup_cosine",
    "embedding_centroids", "user_event_pivot", "bucketed_join_revenue",
    "ingest_violations", "text_stats", "text_quality", "events_asof",
    "topk_small_collection", "events_range_join", "ann_lsh_join",
    "events_salted_agg", "revenue_rollup", "top_orders_per_customer",
    "events_windowed", "text_chunks", "events_sessionize",
    "point_lookup", "collections_catalog", "record_pretty",
    "source_length_stats", "pricing_summary", "segment_revenue",
    "set_ops_customers", "semi_anti_customers", "user_moving_avg",
    "order_percentiles", "cube_revenue", "train_split_counts",
    "promo_revenue", "events_json_props", "monthly_revenue_growth",
    "shipping_priority", "ann_ivf", "ann_quantized", "batch_topk",
    "cosine_kernel_pairs",
}

# Green in the r06 official gate on byte-identical implementations.
# Only these may sit outside the round-7 window. ann_recall and
# dedup_containment were window fill-in candidates but ceded their
# slots to the two NEW round-7 queries (both are r06-official-green,
# and their families' new evidence lands in SCALE.json, not in their
# oracles).
OFFICIAL_R06_UNCHANGED = {
    "ann_recall", "dedup_containment", "ngram_novelty",
    "multimodal_decode", "multimodal_metadata", "ingest_embed",
    "corpus_upsert", "events_rolling_7d", "pack_sequences",
    "token_budget", "kmeans_cells", "span_dedup", "dedup_simhash_pairs",
    "dedup_simhash", "split_contamination", "pii_scrub",
    "pagerank_suppliers", "frequent_tokens", "dedup_jaccard",
    "dedup_keep", "big_orders_customers", "nation_acctbal_outliers",
    "ngram_vocab", "udtf_chunks", "balanced_sample",
    "local_supplier_revenue", "dedup_clusters", "tfidf_top_terms",
    "user_activity_streaks", "order_value_histogram",
    "similarity_join_knn", "text_repetition", "event_funnel",
    "events_retention", "mixture_sample", "snapshot_diff", "events_pmi",
    "split_leakage_safe", "zorder_layout", "user_spend_trend",
    "incremental_revenue", "semantic_dedup", "bm25_search",
    "quality_unigram", "incremental_dedup", "weighted_sample",
}

# Everything that must be inside the 50-slot window this round.
WINDOW_ROUND7 = STALE_OFFICIAL_R05 | CHANGED_ROUND7


def test_every_query_has_an_oracle_or_documented_exemption():
    q = set(em.queries())
    o = set(em.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY_BY_DESIGN, (
        f"queries silently missing oracles: {(q - o) - ROWS_ONLY_BY_DESIGN}")


def test_declared_sets_cover_the_surface_exactly():
    q = set(em.queries())
    declared = WINDOW_ROUND7 | OFFICIAL_R06_UNCHANGED
    assert declared == q, (
        f"undeclared queries: {q - declared} / stale declarations: "
        f"{declared - q}")
    assert not (WINDOW_ROUND7 & OFFICIAL_R06_UNCHANGED), (
        "a query cannot be both in-window and tail-green")
    assert not (STALE_OFFICIAL_R05 & CHANGED_ROUND7), (
        "a query cannot be both stale-rotated and changed")


def test_window_queries_sit_inside_the_gate_window():
    """The driver checks the FIRST 50 entries (observed cap, rounds 1-2).
    Every stale-official and changed-this-round query must land a fresh
    official row."""
    names = list(em.queries().keys())
    window = set(names[:50])
    outside = WINDOW_ROUND7 - window
    assert not outside, (
        f"required queries fall outside the 50-entry window: "
        f"{sorted(outside)}")


def test_tail_queries_all_have_fresh_official_rows():
    """After the r07 rotation no query's newest official row may be
    older than r06 — the tail must consist solely of queries green in
    the r06 gate on byte-identical code."""
    names = list(em.queries().keys())
    tail = set(names[50:])
    unofficial = tail - OFFICIAL_R06_UNCHANGED
    assert not unofficial, (
        f"queries whose newest official row predates r06 fall outside "
        f"the 50-entry window: {sorted(unofficial)}")


def test_callables_and_sql_are_well_formed():
    for name, fn in em.queries().items():
        assert callable(fn), name
    for name, sql in em.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


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
        "uni_héllo✓": (0, 0.0, None),
        "null_int": (None, 0.0, None),
        "date": (0, 0.0, _dt.date(2024, 2, 29)),
    }


def test_window_marker_is_exact():
    """Round 3's review caught an off-by-one: 51 entries sat above the
    'gate window ends here' comment, silently pushing entry 51 out of the
    official gate. Pin the window composition directly: entry 50 (the
    first OUTSIDE the window) must be an officially-green query, and
    every changed query must be at index < 50 (re-asserted here against
    the exact boundary rather than via set membership)."""
    names = list(em.queries().keys())
    assert names[0] == "gate_canary"
    for i, n in enumerate(names):
        if n in WINDOW_ROUND7:
            assert i < 50, f"{n} (required) at index {i} — outside the gate"
    assert names[50] in OFFICIAL_R06_UNCHANGED
