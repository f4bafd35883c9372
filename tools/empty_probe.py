"""Empty-input robustness probe: run every queries() entry on zero rows.

At 100 TB a filter, a partition-pruned read, or an off-peak incremental
batch routinely hands an operator ZERO rows — and a driver-side
``collect()[0]``, a ``max(...) + 1``, or a division by a zero count
turns that into a crashed job instead of an empty result. This tool
synthesizes a scratch sf-dir whose ten tables have the exact sf0.001
schemas and no rows, runs every driver query against it, and reports
each as ok (returned a DataFrame and collected), or the exception type.

Empty output is a PASS; only a raised exception is a finding. Usage:

    python tools/empty_probe.py            # prints one JSON line
    python tools/empty_probe.py --write    # also writes EMPTYCHECK.json
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
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _synthesize_empty(out_dir: str) -> None:
    """Zero-row parquet per table, schema copied from the real files
    (pyarrow only — no Spark job needed to stamp ten empty footers)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    for t in TABLES:
        src = f"{SCHEMA_SF_DIR}/{t}.parquet"
        schema = pq.read_schema(_first_part_file(src))
        os.makedirs(f"{out_dir}/{t}.parquet", exist_ok=True)
        pq.write_table(schema.empty_table(),
                       f"{out_dir}/{t}.parquet/part-00000.parquet")


def _first_part_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            return os.path.join(path, name)
    raise FileNotFoundError(f"no parquet part files under {path}")


def main() -> int:
    import __spark_entry__ as em
    from go_simple_embedding_database_spark.session import get_spark

    spark = get_spark()
    # Deterministic scratch path: a random name would mint a NEW set of
    # fingerprinted warehouse artifacts (bucketed tables, IVF indexes)
    # per run — stable names make reruns reuse instead of accumulate.
    scratch = os.path.join(tempfile.gettempdir(), "gsed-empty-probe")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    results: dict[str, dict] = {}
    try:
        _synthesize_empty(scratch)
        for name, fn in em.queries().items():
            try:
                df = fn(spark, scratch)
                n = df.count()
                results[name] = {"ok": True, "rows": n, "err": None}
            except Exception as exc:  # a crash IS the finding
                results[name] = {
                    "ok": False, "rows": None,
                    "err": f"{type(exc).__name__}: {exc}".splitlines()[0][:200],
                }
                if os.environ.get("SPARK_GRAFT_EMPTY_PROBE_TRACE"):
                    traceback.print_exc()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    failures = {k: v["err"] for k, v in results.items() if not v["ok"]}
    summary = {"n_queries": len(results), "n_ok": len(results) - len(failures),
               "failures": failures, "results": results}
    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "EMPTYCHECK.json"), "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({"n_queries": len(results),
                      "n_ok": len(results) - len(failures),
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
