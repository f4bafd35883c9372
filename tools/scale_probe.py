"""Scaling probe: time flagship operators at 1x and 10x the bench data.

The 100 TB argument in README/PLANS is plan-shape reasoning; this tool
adds measurement: it synthesizes a 10x copy of the sf0.1 documents and
embeddings tables (id-offset replicas — same distributions, same dup
structure) under a scratch dir, runs each flagship operator at both
scales on identical session settings, and prints the time ratio. An
operator whose plan is genuinely linear-ish should land near 10x (or
below, where fixed per-job overhead dominates the 1x number); anything
super-linear is a red flag the per-round bench would never catch.

Usage: python tools/scale_probe.py  (writes nothing to the repo; scratch
data goes under /tmp and is removed on exit)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))


def _synthesize(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("_r") * n_doc).alias("doc_id"),
             "text", "lang", "source", "n_chars")
     .repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet"))
    (emb.crossJoin(reps)
     .select((F.col("vec_id") + F.col("_r") * n_vec).alias("vec_id"),
             "embedding", "label")
     .repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))


def _flagships():
    """name -> callable(spark, sf_dir) returning a DataFrame. Drawn from
    the driver surface where possible so the probe times the same code."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    q = em.queries()
    # Only operators whose OUTPUT is linear in the input belong here: the
    # replicas are exact copies, so pair-producing near-dup queries would
    # see quadratic result growth per duplicate cluster (a property of the
    # data, not the plan) and the ratio would stop measuring the plan.
    return {
        "topk_cosine": q["topk_cosine"],
        "dedup_exact": q["dedup_exact"],
        "text_quality": q["text_quality"],
        "quality_unigram": q["quality_unigram"],
        "span_dedup": q["span_dedup"],
        "bm25_search": q["bm25_search"],
        "kmeans_cells": q["kmeans_cells"],
        "embedding_centroids": q["embedding_centroids"],
        # round 3 additions — all linear-output:
        "dedup_simhash": q["dedup_simhash"],      # 60-bit fp, 1 row/doc
        "token_budget": q["token_budget"],        # histogram refinement
        "frequent_tokens": q["frequent_tokens"],  # MG sketch + recount
        "tfidf_top_terms": q["tfidf_top_terms"],  # tf materialized, 3 rows/doc
    }


def main() -> None:
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.session import get_spark
    spark = get_spark(app_name="scale-probe")

    def run(df):
        # touch every row without collecting (same sink as bench.py)
        df.select(F.count(F.coalesce(F.col(df.columns[0]).cast("string"),
                                     F.lit("")))).collect()

    scratch = tempfile.mkdtemp(prefix="gsed_scale_")
    results = {}
    try:
        _synthesize(spark, scratch)
        for name, fn in _flagships().items():
            times = {}
            for label, d in (("1x", SF_DIR), (f"{REPLICAS}x", scratch)):
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    spark._jvm.System.gc()
                    t0 = time.perf_counter()
                    run(fn(spark, d))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                times[label] = round(best, 3)
            ratio = round(times[f"{REPLICAS}x"] / times["1x"], 2)
            results[name] = {**times, "ratio": ratio}
            print(f"{name}: 1x={times['1x']}s {REPLICAS}x="
                  f"{times[f'{REPLICAS}x']}s ratio={ratio}", flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"replicas": REPLICAS, "results": results}))


if __name__ == "__main__":
    main()
