"""NULL-injection robustness probe: every query over tables with NULLs.

Real 100 TB tables are full of NULLs — a failed enrichment, a schema
migration, a malformed source record — and the synthetic testdata has
none, so nothing exercises the operators' null paths end-to-end. This
tool copies the sf0.001 tables and APPENDS a few adversarial rows per
table: every non-id column NULL (ids stay valid and unique — a NULL id
is a *constraint violation* the ingest operators reject by design,
which would turn by-design errors into probe noise), plus an
empty-string text row for documents and an empty-array embedding row
for embeddings. Every driver query then runs against the poisoned dir.

A raised exception is a finding; changed row counts are expected and
fine (the probe checks crash-freedom, not value semantics — the DuckDB
oracle gate owns those).

Usage:
    python tools/null_probe.py            # prints one JSON line
    python tools/null_probe.py --write    # also writes NULLCHECK.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# (table, id columns kept valid) — composite for lineitem
ID_COLS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"], "events": ["event_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}
N_NULL_ROWS = 3


def _first_part_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            return os.path.join(path, name)
    raise FileNotFoundError(f"no parquet part files under {path}")


def _poison(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    for t, id_cols in ID_COLS.items():
        src = f"{SCHEMA_SF_DIR}/{t}.parquet"
        tab = pq.read_table(_first_part_file(src))
        # next free id per id column (max + 1, +row offset)
        base = {c: (max(x.as_py() for x in tab[c]) + 1 if tab.num_rows
                    else 0) for c in id_cols}
        extra = []
        for i in range(N_NULL_ROWS):
            row = {name: None for name in tab.schema.names}
            for c in id_cols:
                row[c] = base[c] + i
            extra.append(row)
        if t == "documents":   # empty-but-not-null text row
            extra.append({"doc_id": base["doc_id"] + N_NULL_ROWS,
                          "text": "", "lang": "en", "source": "probe",
                          "n_chars": 0})
        if t == "embeddings":  # empty-array (dim-0) vector row
            extra.append({"vec_id": base["vec_id"] + N_NULL_ROWS,
                          "embedding": [], "label": 0})
        poisoned = pa.concat_tables(
            [tab, pa.Table.from_pylist(extra, schema=tab.schema)])
        os.makedirs(f"{out_dir}/{t}.parquet", exist_ok=True)
        pq.write_table(poisoned, f"{out_dir}/{t}.parquet/part-00000.parquet")


def main() -> int:
    import __spark_entry__ as em
    from go_simple_embedding_database_spark.session import get_spark

    spark = get_spark()
    # Deterministic scratch path: a random name would mint a NEW set of
    # fingerprinted warehouse artifacts (bucketed tables, IVF indexes)
    # per run — stable names make reruns reuse instead of accumulate.
    scratch = os.path.join(tempfile.gettempdir(), "gsed-null-probe")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    results: dict[str, dict] = {}
    try:
        _poison(scratch)
        for name, fn in em.queries().items():
            try:
                n = fn(spark, scratch).count()
                results[name] = {"ok": True, "rows": n, "err": None}
            except Exception as exc:
                results[name] = {
                    "ok": False, "rows": None,
                    "err": f"{type(exc).__name__}: {exc}".splitlines()[0][:200],
                }
                if os.environ.get("SPARK_GRAFT_NULL_PROBE_TRACE"):
                    traceback.print_exc()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    failures = {k: v["err"] for k, v in results.items() if not v["ok"]}
    summary = {"n_queries": len(results), "n_ok": len(results) - len(failures),
               "failures": failures, "results": results}
    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "NULLCHECK.json"), "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({"n_queries": len(results),
                      "n_ok": len(results) - len(failures),
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
