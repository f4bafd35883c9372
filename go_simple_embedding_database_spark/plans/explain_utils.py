"""Physical-plan introspection helpers.

The 100 TB contract is enforced here: tests assert the OPTIMIZED plan, not
just the result — filters reach the parquet scan (PushedFilters), scans
read only needed columns (ReadSchema), top-k compiles to
TakeOrderedAndProject (no global sort), small dimensions broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in physical plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in physical plan:\n{plan}"


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the parquet scan."""
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, f"no PushedFilters section in plan:\n{plan}"
    assert fragment in plan, f"expected pushed filter {fragment!r} in plan:\n{plan}"
