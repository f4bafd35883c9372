"""One-pass table profiling (operators/profile.py)."""

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.profile import (
    table_profile, table_profile_sql)


def _profile_map(df, **kw):
    return {r.column: r for r in table_profile(df, **kw).collect()}


def test_profile_statistics_match_brute_force(spark):
    rows = [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (None, None, None)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    p = _profile_map(df)
    assert p["k"].n_rows == 4 and p["k"].n_nulls == 1
    assert p["k"].null_frac == 0.25 and p["k"].n_distinct == 3
    assert p["k"].min_value == "1" and p["k"].max_value == "3"
    assert p["s"].n_distinct == 2 and p["s"].max_value == "b"
    assert p["v"].n_nulls == 2 and p["v"].null_frac == 0.5


def test_profile_all_null_column_verdict_is_definite_zero(spark):
    """An all-NULL column must yield n_distinct 0 and a DEFINITE 0
    verdict (never NULL) — the HLL-row NULL-proofing contract."""
    df = spark.createDataFrame([(1, None), (2, None)], "k long, x string")
    p = _profile_map(df)
    assert p["x"].n_distinct == 0
    assert p["x"].distinct_within_10pct == 0
    assert p["x"].min_value is None and p["x"].max_value is None


def test_profile_empty_table_one_row_per_column(spark):
    df = spark.createDataFrame([], "k long, s string")
    p = _profile_map(df)
    assert set(p) == {"k", "s"}
    assert p["k"].n_rows == 0 and p["k"].null_frac is None
    assert p["k"].distinct_within_10pct == 0


def test_profile_production_shape_drops_exact_control(spark):
    """exact_control=False: no countDistinct (no Expand in the plan),
    n_distinct carries the HLL++ estimate, verdict NULL."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    df = spark.range(1000).select(F.col("id").alias("k"))
    out = table_profile(df, exact_control=False)
    assert "Expand" not in formatted_plan(out)
    row = out.collect()[0]
    # HLL++ at rsd=0.02: the estimate lands within 10% of 1000
    assert abs(row.n_distinct - 1000) <= 100
    assert row.distinct_within_10pct is None


def test_profile_sql_twin_matches_on_duckdb(spark):
    """Spark profile == the naive UNION ALL twin on the same data."""
    import duckdb
    rows = [(i, f"s{i % 7}", i % 3 if i % 5 else None)
            for i in range(200)]
    df = spark.createDataFrame(rows, "k long, s string, v long")
    got = sorted(map(tuple, table_profile(df).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE t (k BIGINT, s VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.sql(
        table_profile_sql("t", ["k", "s", "v"])).fetchall()))
    norm = lambda t: tuple(round(x, 6) if isinstance(x, float) else x
                           for x in t)
    assert [norm(g) for g in got] == [norm(w) for w in want]
