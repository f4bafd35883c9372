"""As-of and range (interval) join operators — semantics pinned against
tiny hand-computed fixtures, then scale behavior via the oracle parity
suite (events_asof / events_range_join)."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.joins import (
    asof_join, range_join, _interval_seconds)


def _t(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame([
        ("a", _t("2024-01-01T10:00:00"), 100.0),
        ("a", _t("2024-01-01T10:05:00"), 101.0),
        ("a", _t("2024-01-01T10:10:00"), 102.0),
        ("b", _t("2024-01-01T10:03:00"), 50.0),
    ], "sym string, ts timestamp, px double")
    trades = spark.createDataFrame([
        ("a", _t("2024-01-01T10:04:00"), 1),   # -> quote 10:00 (100.0)
        ("a", _t("2024-01-01T10:05:00"), 2),   # -> quote 10:05 inclusive (101.0)
        ("a", _t("2024-01-01T09:59:00"), 3),   # -> no prior quote (null)
        ("b", _t("2024-01-01T11:00:00"), 4),   # -> 10:03 (50.0)
    ], "sym string, ts timestamp, trade_id int")
    return quotes, trades


def test_asof_backward_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "ts", payload_cols=["px"])
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: None, 4: 50.0}


def test_asof_backward_exclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "ts", payload_cols=["px"],
                    inclusive=False)
    got = {r.trade_id: r.px for r in out.collect()}
    assert got[2] == 100.0          # 10:05 quote no longer eligible at 10:05
    assert got == {1: 100.0, 2: 100.0, 3: None, 4: 50.0}


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "ts", payload_cols=["px"],
                    direction="forward")
    got = {r.trade_id: r.px for r in out.collect()}
    # earliest quote at-or-after each trade
    assert got == {1: 101.0, 2: 101.0, 3: 100.0, 4: None}


def test_asof_preserves_left_row_count(spark, sf_dir):
    from go_simple_embedding_database_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("cv"))
    out = asof_join(purchases, clicks, ["user_id"], "ts", payload_cols=["cv"])
    assert out.count() == purchases.count()


def test_range_join_matches_naive(spark, sf_dir):
    """Banded range_join == naive equi-join + BETWEEN filter on real data."""
    from go_simple_embedding_database_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events").limit(2000)
    s = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("err_id"))
    banded = range_join(s, e.withColumnRenamed("ets", "ts"), ["user_id"], "ts",
                        lower="10 minutes", upper="10 minutes")
    got = {(r.event_id, r.err_id) for r in banded.collect()}
    naive = (s.join(e, "user_id")
             .filter((F.col("ets") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
                     & (F.col("ets") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES"))))
    want = {(r.event_id, r.err_id) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_interval_seconds():
    assert _interval_seconds("5 minutes") == 300
    assert _interval_seconds("30 seconds") == 30
    assert _interval_seconds("2 hours") == 7200
    assert _interval_seconds("1 day") == 86400
