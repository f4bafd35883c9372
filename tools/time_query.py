"""Time individual declared queries with the noop sink (guide §1.4).

Round-10 optimization loop tool: same methodology as bench.py (noop
sink, cleared cache, pre-run GC, labeled jobs) but for a handful of
queries with more repeats, so a single change can be evaluated without
paying for a full 98-query draw.

Usage::

    python tools/time_query.py dedup_containment kmeans_cells [-n 5]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from go_simple_embedding_database_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i:i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gsed-time-query")

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Same warmup as bench.py: plan-compile via a cheap query + fork the
    # per-core Python workers once, outside any measurement.
    _noop(em.queries()["topk_cosine"](spark, sf_dir))

    def _warm(batches):
        import numpy  # noqa: F401
        for b in batches:
            yield b * 1.0

    par = spark.sparkContext.defaultParallelism
    _noop(spark.range(par * 4, numPartitions=par)
          .selectExpr("cast(id as double) id")
          .mapInPandas(_warm, "id double"))

    q = em.queries()
    for name in names:
        runs = []
        for i in range(n):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"time_query: {name} #{i}")
            t0 = time.perf_counter()
            _noop(q[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: median={statistics.median(runs):.4f} "
              f"min={min(runs):.4f} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
