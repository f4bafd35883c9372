"""Controlled A/B re-measurement of bench regressions (VERDICT r05 #3).

BENCH_r04 -> BENCH_r05 showed two sub-second regressions with no code
change: snapshot_diff 0.35 -> 0.77 s and ingest_embed 0.61 -> 0.95 s.
The r04 numbers were single-shot; r05 switched to median-of-3. This tool
settles noise-vs-real: it times the named queries median-of-N (default 5)
in one fresh session with bench.py's exact protocol (same warmup, same
noop sink, same clearCache+GC between runs), and records the verdict in
ABCHECK.json next to the historical official numbers.

Usage:
    python tools/ab_timing.py                       # the two r05 suspects
    python tools/ab_timing.py --queries a,b --runs 7

Interpretation contract: the implementations are byte-identical across
r04/r05/r06 for these queries (verified by `git diff 26d0639..HEAD`
touching neither operators/maintenance.py nor the ingest path — record
the check in the JSON's `code_identity` note when running), so ONE
median-of-N on current code is the A/B: if it lands near the r04 number,
the r05 official medians drew a noisy session; if near r05, r04's
single-shots were the lucky draw.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = ["snapshot_diff", "ingest_embed"]

# Historical official medians these measurements adjudicate between.
OFFICIAL = {
    "snapshot_diff": {"r04_single_shot": 0.35, "r05_median_of_3": 0.77},
    "ingest_embed": {"r04_single_shot": 0.61, "r05_median_of_3": 0.95},
}


def _code_identity(paths: list[str], base: str = "26d0639") -> dict:
    """Record whether the implementation files changed since ``base``
    (the r04 tip) — the premise that one current-code measurement
    adjudicates both rounds."""
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", base, "HEAD", "--", *paths],
            cwd=ROOT, capture_output=True, text=True, timeout=30)
        changed = [l for l in out.stdout.splitlines() if l.strip()]
        return {"base": base, "paths": paths, "changed_since_base": changed}
    except Exception as e:  # git unavailable: note it, don't die
        return {"base": base, "paths": paths,
                "error": f"{type(e).__name__}: {e}"}


def main() -> None:
    args = sys.argv[1:]
    names = DEFAULT_QUERIES
    runs_n = 5
    if "--queries" in args:
        names = args[args.index("--queries") + 1].split(",")
    if "--runs" in args:
        runs_n = int(args[args.index("--runs") + 1])

    import __spark_entry__ as em
    from go_simple_embedding_database_spark.session import get_spark

    spark = get_spark(app_name="gsed-ab")
    qs = em.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # bench.py's warmup: JVM + codegen + parquet footers + Python workers
    run(qs["topk_cosine"](spark, SF_DIR))

    results = {}
    for name in names:
        fn = qs[name]
        runs: list[float] = []
        for _ in range(runs_n):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            run(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 4))
        results[name] = {
            "median": round(statistics.median(runs), 4),
            "runs": runs,
            "official": OFFICIAL.get(name, {}),
        }
        print(f"{name}: median {results[name]['median']}s  runs {runs}",
              flush=True)

    out = {
        "sf_dir": SF_DIR,
        "n_runs": runs_n,
        "protocol": "bench.py noop sink, clearCache+System.gc between runs",
        "code_identity": _code_identity([
            "go_simple_embedding_database_spark/operators/maintenance.py",
            "go_simple_embedding_database_spark/database.py",
            "go_simple_embedding_database_spark/functions/embedders.py",
        ]),
        "results": results,
    }
    with open(os.path.join(ROOT, "ABCHECK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
