"""Mimics the driver's correctness gate locally: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values. Runs at sf0.001 for
speed (the driver runs sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    # Lockstep twin of tools/self_correctness.py::_norm — floats
    # normalize to the repr STRING of the round-6 value so the compare
    # distinguishes -0.0 from 0.0 exactly like the driver's byte hash
    # (the round-8 embedding_covariance lesson: Python's `==` reads
    # -0.0 == 0.0, the driver's value hash does not).
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, (int, bool)):
        return v
    return str(v) if v is not None else None


def _key(row):
    return tuple(_norm(v) for v in row)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    if sql is None:
        assert len(srows) >= 0  # rows-only check, mirrors driver behavior
        return
    ddf = duck.sql(sql)
    drows = ddf.fetchall()
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ddf.columns], (
        f"{name}: column mismatch {sdf.columns} vs {ddf.columns}")
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset = sorted(_key(tuple(r)) for r in srows)
    dset = sorted(_key(tuple(r)) for r in drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_approx_distinct_error_bound(spark):
    """Every group's HLL++ estimate must land within 10% of the exact
    count at rsd=0.02 (generous bound — the guarantee is probabilistic).
    Since round 6 the query EXPORTS this verdict (within_10pct), so the
    official gate's hash-match is the same assertion; this twin keeps the
    failure message local and also pins non-empty groups."""
    rows = entry_mod.queries()["approx_distinct_users"](spark, SF_DIR).collect()
    assert rows and all(r.within_10pct == 1 for r in rows)
    assert all(r.n_exact > 0 for r in rows)


def test_approx_distinct_all_null_group_is_definite_zero(spark, tmp_path):
    """ADVICE r06: a group whose user_id values are ALL NULL has
    n_exact = 0 — the relative-error division must not raise (ANSI mode)
    or leave within_10pct NULL (which would hash-mismatch the oracle's
    n_exact>0 verdict). Both sides now gate on n_exact > 0, so the
    verdict is a definite int 0 and Spark == DuckDB by construction."""
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
         (2, "2024-01-01 00:00:01", None, "ghost", 1.0, "{}"),
         (3, "2024-01-01 00:00:02", None, "ghost", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    rows = {r.event_type: r for r in entry_mod.queries()
            ["approx_distinct_users"](spark, str(tmp_path)).collect()}
    assert rows["ghost"].n_exact == 0
    assert rows["ghost"].within_10pct == 0          # definite, not NULL
    assert rows["click"].within_10pct == 1
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet/*.parquet')")
    drows = {r[0]: r for r in con.sql(
        entry_mod.oracle_sql()["approx_distinct_users"]).fetchall()}
    assert {k: (v.n_exact, v.within_10pct) for k, v in rows.items()} == \
        {k: (v[1], v[2]) for k, v in drows.items()}


def test_pipeline_affix_stage_drops_truncation_duplicates(spark, tmp_path):
    """VERDICT r06 #6: the suffix-truncation engine must run under a full
    composed engine plan, not only in fixture tests. The driver corpus has
    zero natural suffix pairs (measured, r06), so this plants one of each
    affix direction and runs the REAL pipeline query end-to-end: doc 2
    (a prefix cut of doc 1) and doc 3 (a suffix slice of doc 1) must be
    dropped by the affix stage while doc 1 and an unrelated doc survive —
    and the DuckDB oracle must agree on the same corpus.

    Round 8: the pipeline additionally unions its own 2-row planted
    suffix pair into every corpus (VERDICT r07 #6 — both engines), so
    the bannered survivor doc 10000000001 appears here too and its bare
    suffix 10000000002 must be dropped alongside the planted docs 2/3."""
    import duckdb
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.functions import text as tx

    full = ("the quick brown fox jumps over the lazy dog while many people "
            "watch the long river flow past the old stone house and the "
            "small grey cat walks slowly near the wooden bridge where the "
            "children play simple games in the warm summer evening light "
            "before they return home for the quiet family dinner together")
    other = ("a gentle rain falls on the green hills this morning and the "
             "farmers walk between the tall wet trees to check the young "
             "plants growing near the clear stream that runs down from the "
             "high mountain toward the wide valley and the sleepy village")
    rows = [(1, full), (2, full[:150]), (3, full[-150:]), (4, other)]
    df = (spark.createDataFrame(rows, "doc_id long, text string")
          .withColumn("lang", tx.language_id(F.col("text")))
          .withColumn("source", F.lit("t"))
          .withColumn("n_chars", F.length("text")))
    # guard: every planted row clears the quality gate (the lang gate
    # passes by construction: lang := language_id(text)), so any drop
    # below can only come from the affix stage
    assert df.filter(tx.quality_score(F.col("text")) >= 0.5).count() == 4
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = entry_mod.queries()["pipeline_clean_corpus"](spark, str(tmp_path))
    surviving = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert surviving == {1, 4, 10_000_000_001}, surviving
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet/*.parquet')")
    osurv = {r[0] for r in con.sql(
        f"SELECT DISTINCT doc_id FROM "
        f"({entry_mod.oracle_sql()['pipeline_clean_corpus']})").fetchall()}
    assert osurv == {1, 4, 10_000_000_001}, osurv


def test_planted_suffix_pair_passes_its_gates(spark):
    """Restored (ADVICE r09): the planted pair (VERDICT r07 #6) only
    exercises the suffix arm if BOTH docs survive the pipeline's quality
    and language filters and the bare article is a proper suffix of the
    bannered copy — pin those preconditions directly so a future
    gate-threshold change can't silently turn the fixture into a no-op
    (the end-to-end test alone still passes if the docs start being
    dropped by the WRONG stage)."""
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.functions import text as tx
    banner, bare = entry_mod._PLANTED_SUFFIX_DOCS
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


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0].sim == pytest.approx(1.0)


def test_norm_is_signed_zero_sensitive():
    """Round-8 lesson made structural: the comparator must distinguish
    what the driver's byte hash distinguishes. Its former `round==`
    normalization read -0.0 == 0.0 and reported green on a red official
    gate (embedding_covariance). Planted probes, one per pattern."""
    # signed zero — the round-8 divergence class
    assert _norm(-0.0) != _norm(0.0)
    # a tiny negative that ROUNDS to zero must keep its sign distinct
    assert _norm(-1e-9) != _norm(1e-9)
    assert _norm(-1e-9) == _norm(-0.0)
    assert _norm(1e-9) == _norm(0.0)
    # NaN — sentinel, equal to itself, distinct from zero
    assert _norm(float("nan")) == "NaN" != _norm(0.0)
    # ordinary values still normalize identically across magnitudes
    assert _norm(0.3333333333) == _norm(0.33333349999)  # both → 0.333333
    assert _norm(2.0) == _norm(2.0000000001)
    assert _norm(-0.5) != _norm(0.5)


def test_norm_twins_are_in_lockstep():
    """EVERY value comparator in the repo — SELFCHECK
    (tools/self_correctness.py), UNICHECK (tools/unicode_probe.py),
    FETCHCHECK (tools/gate_fetch_paths.py) and this file's _norm — must
    be the SAME function behaviorally: a skew between any pair is
    exactly how a red gate hides behind a green artifact (round 8)."""
    import datetime
    from decimal import Decimal

    from tools.gate_fetch_paths import _norm as fetch_norm
    from tools.self_correctness import _norm as tool_norm
    from tools.unicode_probe import _norm as uni_norm

    probes = [0.0, -0.0, 1e-9, -1e-9, float("nan"), 0.333333, -0.5,
              2.0, 9007199254740993, -42, True, None, "héllo✓",
              Decimal("1.50"), datetime.date(2024, 2, 29)]
    for p in probes:
        assert _norm(p) == tool_norm(p) == uni_norm(p) == fetch_norm(p), p
