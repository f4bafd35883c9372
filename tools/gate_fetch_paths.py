"""Gate-robustness probe: re-run the driver's oracle comparison under
EVERY plausible DuckDB client fetch path.

Round 2's six official hash mismatches were caused by the ORACLE side's
client conversion, not by either engine's arithmetic: ``sum(BIGINT)``
returns HUGEINT, which ``fetchall()`` converts to exact Python ints but
``fetchdf()``/pandas converts to float64 — same values, different hash.
The repo now bans HUGEINT/DECIMAL oracle outputs (tests/test_oracle_types
.py), but the driver's fetch path is unknown and may change. This tool
proves the surface is fetch-path-independent: for every ``oracle_sql()``
entry it compares the Spark result against the oracle fetched via

  * ``fetchall()``      (exact Python scalars),
  * ``fetchdf()``       (pandas, numpy dtypes),
  * ``arrow()``         (pyarrow table -> python),

normalized with the shared round-6 convention. Any query whose verdict
differs BETWEEN fetch paths is a latent gate risk even if SELFCHECK is
green. Run:

    python tools/gate_fetch_paths.py            # sf0.01, full surface

Known result (recorded in FETCHCHECK.json, whose ``n_queries`` field is
authoritative for the surface size): fetchall and arrow agree with
Spark on every oracle-checked query. The pandas path diverges
on exactly the 5 queries in ``KNOWN_PANDAS_DIVERGENCES`` below — each
named in the artifact with the reason its divergence is accepted
(VERDICT r05 #5). They are pandas CLIENT conversions, not engine
disagreements; all hold green official gate rows, which proves the
driver does not fetch through pandas. The divergences are kept visible
here rather than papered over by contorting the queries (an as-of join
whose unmatched rows can't be NULL stops demonstrating unmatched
handling). If a future round shows these flipping to hash_match=false
together, the driver switched to a pandas fetch and the fix is
NULL-free/date-free output columns, not arithmetic.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    # Keep in lockstep with tools/self_correctness.py::_norm —
    # sign-sensitive since round 9 (repr distinguishes -0.0 from 0.0,
    # like the driver's byte hash; the round-8 covariance lesson).
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if isinstance(v, (int, bool)):
        return v
    return str(v) if v is not None else None


def _norm_np(v):
    """Normalize a value that may carry a numpy/pandas dtype — the shape
    the driver sees if it fetches through pandas."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return _norm(float("nan")) if isinstance(v, float) else None
    if isinstance(v, (np.floating,)):
        return _norm(float(v))
    if isinstance(v, (np.integer,)):
        return _norm(int(v))
    if isinstance(v, (np.bool_,)):
        return _norm(bool(v))
    if isinstance(v, pd.Timestamp):
        return _norm(v.to_pydatetime())
    if isinstance(v, np.ndarray):
        return str(list(v))
    return _norm(v)


# Accepted pandas-path divergences, each with the reason it is ALLOWED
# to differ (VERDICT r05 #5: the artifact itself must carry the names and
# reasons, not just a count). These are CLIENT conversions in the pandas
# fetch path, not engine disagreements — fetchall/arrow stay green, and
# each query holds a green official gate row, proving the driver does not
# fetch through pandas. Any divergence NOT in this dict is recorded as
# unexplained and must be investigated.
#
# Re-confirmed 2026-08-16 (round 10, VERDICT r09 #7): on the current
# stack (duckdb 1.0.0, pandas 2.2.2, pyarrow 16.1.0) fetchdf() still
# widens nullable BIGINT to float64 (NULL->NaN) and converts DATE to
# datetime64 Timestamp — measured directly, not assumed. None of the
# named divergences became fixable without stripping the queries of the
# NULL-/DATE-demonstrating semantics they exist to carry; re-pinned.
# (incremental_revenue left the gate surface in the round-10
# consolidation; its entry stays harmless if absent from the run.)
KNOWN_PANDAS_DIVERGENCES: dict[str, str] = {
    "gate_canary": (
        "BY DESIGN: the canary's null_int and date probes carry exactly "
        "the two pandas hazards (NULL->NaN widening, DATE->Timestamp) so "
        "a pandas-fetching gate is identifiable from the canary row alone "
        "in the official CORRECTNESS file."),
    "events_asof": (
        "nullable BIGINT/DOUBLE output column (unmatched as-of rows): "
        "pandas widens to float64 and turns SQL NULL into NaN, which no "
        "value-normalization can un-conflate with a real NaN. Making the "
        "column NULL-free would stop demonstrating unmatched handling."),
    "user_moving_avg": (
        "nullable numeric output column: pandas NULL->NaN float64 "
        "widening, same client conversion as events_asof."),
    "monthly_revenue_growth": (
        "nullable numeric output column (first month has no prior-month "
        "growth): pandas NULL->NaN float64 widening."),
    "incremental_revenue": (
        "DATE output column: pandas converts to datetime64[ns] Timestamp, "
        "which string-normalizes with a spurious midnight time part."),
}


def main() -> None:
    import duckdb

    import __spark_entry__ as em
    from go_simple_embedding_database_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = em.oracle_sql()
    report: dict[str, dict] = {}
    bad = 0
    hard_bad: list[str] = []
    for name, fn in em.queries().items():
        sql = oracles.get(name)
        if sql is None:
            continue
        sdf = fn(spark, SF_DIR)
        s = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())

        verdicts = {}
        rel = con.sql(sql)
        verdicts["fetchall"] = (
            sorted(tuple(_norm(v) for v in r) for r in rel.fetchall()) == s)
        pdf = con.sql(sql).fetchdf()
        verdicts["fetchdf"] = (
            sorted(tuple(_norm_np(v) for v in r)
                   for r in pdf.itertuples(index=False, name=None)) == s)
        tbl = con.sql(sql).arrow()
        verdicts["arrow"] = (
            sorted(tuple(_norm(v) for v in r)
                   for r in zip(*(c.to_pylist() for c in tbl.columns))) == s)

        report[name] = verdicts
        if not all(verdicts.values()):
            bad += 1
            verdicts["reason"] = KNOWN_PANDAS_DIVERGENCES.get(
                name, "UNEXPLAINED — not an accepted pandas client "
                      "conversion; investigate before shipping")
            print(f"DIVERGES {name}: {verdicts}", flush=True)
        else:
            print(f"ok {name}", flush=True)
        # Exit status tracks the EXACT paths only: pandas divergences are
        # expected (NULL→NaN / DATE→Timestamp client conversions, and the
        # canary carries them on purpose — see module docstring); a
        # fetchall or arrow divergence means a real cross-engine result
        # difference and must fail loudly.
        if not (verdicts["fetchall"] and verdicts["arrow"]):
            hard_bad.append(name)

    divergent = {n: v["reason"] for n, v in report.items() if "reason" in v}
    out = {"sf_dir": SF_DIR, "n_queries": len(report),
           "n_divergent": bad, "n_exact_path_divergent": len(hard_bad),
           # headline summary: every divergent query named with the reason
           # its pandas-path difference is accepted (or UNEXPLAINED)
           "divergent": divergent,
           "n_unexplained": sum("UNEXPLAINED" in r for r in divergent.values()),
           "results": report}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FETCHCHECK.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(report)} queries, {bad} fetch-path-divergent, "
          f"{len(hard_bad)} on exact paths")
    sys.exit(1 if hard_bad else 0)


if __name__ == "__main__":
    main()
