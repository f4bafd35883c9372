"""Ordered funnel + cohort retention: ordering semantics and plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators.funnel import (
    cohort_retention, funnel_counts, funnel_times)


def _ev(uid, t, typ):
    return (uid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), typ)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the whole funnel in order
        _ev(1, 0, "signup"), _ev(1, 1, "view"), _ev(1, 2, "click"),
        _ev(1, 3, "purchase"),
        # u2 purchases BEFORE clicking: purchase must not count
        _ev(2, 0, "signup"), _ev(2, 1, "view"), _ev(2, 3, "click"),
        _ev(2, 2, "purchase"),
        # u3 views before signing up: the early view must not count, but
        # a later view re-qualifies
        _ev(3, 0, "view"), _ev(3, 1, "signup"), _ev(3, 2, "view"),
        # u4 never signs up: reaches no stage
        _ev(4, 0, "view"), _ev(4, 1, "click"), _ev(4, 2, "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


STAGES = ["signup", "view", "click", "purchase"]


def test_funnel_times_strict_order(spark, events):
    t = {r.user_id: r for r in funnel_times(events, STAGES).collect()}
    assert t[1].purchase_ts is not None
    assert t[2].click_ts is not None and t[2].purchase_ts is None
    # u3's qualifying view is the one AFTER signup
    assert t[3].view_ts == dt.datetime(2024, 1, 1, 2)
    assert t[4].signup_ts is None and t[4].view_ts is None


def test_funnel_counts_monotone(spark, events):
    rows = sorted(funnel_counts(events, STAGES).collect(),
                  key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == STAGES
    counts = [r.n_users for r in rows]
    assert counts == [3, 3, 2, 1]
    assert counts == sorted(counts, reverse=True)


def test_funnel_single_exchange(spark, events):
    """Every chained stage window shares the user_id partitioning: the
    per-user plan section must contain exactly one hash exchange."""
    plan = (funnel_times(events, STAGES)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_requires_stages(spark, events):
    with pytest.raises(ValueError, match="stages"):
        funnel_times(events, [])


def test_cohort_retention_triangle(spark):
    rows = [
        _ev(1, 0, "view"),            # u1 first day 0 -> cohort 0
        _ev(1, 24 * 8, "view"),       # active 8 days later -> period 1
        _ev(2, 24 * 7, "view"),       # u2 first day 7 -> cohort 1
        _ev(2, 24 * 7, "click"),      # same period, counted once
        _ev(2, 24 * 15, "view"),      # 8 days after first -> period 1
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {(r.cohort, r.periods_since): r.n_users
           for r in cohort_retention(df, period_days=7).collect()}
    assert out == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 1): 1}


def test_cohort_retention_no_global_window(spark):
    """The corpus-min anchor must arrive via broadcast, not an empty
    partitionBy() window (which would funnel every row into one task)."""
    df = spark.createDataFrame([_ev(1, 0, "view")],
                               "user_id long, ts timestamp, event_type string")
    plan = (cohort_retention(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange SinglePartition" not in plan or "BroadcastExchange" in plan
    # stronger: no Window over an empty partition spec
    assert "windowspecdefinition()" not in plan.lower().replace(" ", "")
