"""Regression guard for the round-2 gate failure mode: every one of the
six CORRECTNESS_r02 hash mismatches — and ONLY those six — was an oracle
exposing a DuckDB HUGEINT output column (``sum(BIGINT)`` widens to
int128). HUGEINT's client-side conversion differs across DuckDB versions
(exact int vs float64 in pandas/arrow), so an exposed HUGEINT column can
flip the gate's value hash between environments while both engines'
answers are identical. Repo rule: oracle output columns must never be
HUGEINT/UHUGEINT/DECIMAL — cast integer sums to BIGINT.

This test DESCRIBEs every oracle (LIMIT 0 — no data scanned beyond
planning) and fails on any banned output type, so the hazard cannot be
reintroduced by a new query.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_output_types_are_portable(duck, name):
    sql = entry_mod.oracle_sql()[name]
    rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in BANNED or str(t).startswith("DECIMAL")
    ]
    assert not bad, (
        f"{name}: oracle exposes environment-sensitive output types {bad}; "
        "cast integer sums to BIGINT (see CORRECTNESS_r02 post-mortem)")
