"""Round-10 gate consolidation: the two queries retired from the
50-slot gate surface keep FULL Spark-vs-DuckDB parity coverage here —
capability is not dropped, only its gate slot is (VERDICT r09 #8's
replacement rule, spent on the degenerate-document class closure).

- local_supplier_revenue: revenue-join aggregate; the capability stays
  officially gated 5× over (bucketed_join_revenue, segment_revenue,
  revenue_rollup, cube_revenue, promo_revenue).
- events_rolling_7d: rolling time-window aggregate; capability stays
  officially gated via user_moving_avg.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    return v


@pytest.mark.parametrize("name", sorted(entry_mod.RETIRED_QUERIES))
def test_retired_query_still_matches_its_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'")
    sdf = entry_mod.RETIRED_QUERIES[name](spark, SF_DIR)
    got = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
    res = con.sql(entry_mod.retired_oracle_sql()[name])
    want = sorted(tuple(_norm(v) for v in r) for r in res.fetchall())
    assert [c.lower() for c in sdf.columns] == \
        [c.lower() for c in res.columns], name
    assert got == want, (name, got[:3], want[:3])
    assert got, f"{name} returned zero rows — vacuous parity"


def test_retired_names_were_readmitted_to_the_declared_surface():
    """The r10 OPTIMIZATION pass re-admitted both (appended after the
    50-entry build window): the optimization driver re-runs every
    declared query and treats one that disappeared vs the last official
    surface (r09's 98) as a regression. The registry stays because
    tooling addresses the pair through it; the gate and this file now
    both cover them (redundant parity, deliberately)."""
    q = set(entry_mod.queries())
    assert set(entry_mod.RETIRED_QUERIES) <= q
    assert set(entry_mod.retired_oracle_sql()) == \
        set(entry_mod.RETIRED_QUERIES)
    for name in entry_mod.RETIRED_QUERIES:
        assert entry_mod.oracle_sql()[name] == \
            entry_mod.retired_oracle_sql()[name]
