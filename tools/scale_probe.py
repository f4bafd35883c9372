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


def _synthesize_disjoint(spark, out_dir: str, replicas: int) -> None:
    """10x documents whose replicas are pairwise DISSIMILAR: every word is
    prefixed with its replica tag (an injective per-replica token rename),
    so within-replica shingle/minhash/simhash similarity structure is
    isomorphic to the original corpus while cross-replica shingle sets
    are disjoint. Pair-producing dedup operators then emit ~REPLICASx the
    original pairs — linear output — and their time ratio measures the
    PLAN, which exact-copy replication (quadratic cross-replica pairs)
    cannot."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).select(F.col("id").alias("_r"))
    tagged = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit("r"), F.col("_r").cast("string"),
                                       F.lit("·"), w)), " ")
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("_r") * n_doc).alias("doc_id"),
             tagged.alias("text"), "lang", "source")
     .withColumn("n_chars", F.length("text"))
     .repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet"))


def _pair_flagships():
    """Pair-producing near-dup operators, probed against the disjoint-
    replica corpus (see _synthesize_disjoint). Linear-output there, so the
    10x ratio measures the banded-join plans the 100 TB story leans on."""
    import __spark_entry__ as em
    q = em.queries()
    return {
        "dedup_minhash": q["dedup_minhash"],
        "dedup_jaccard": q["dedup_jaccard"],
        "dedup_simhash_pairs": q["dedup_simhash_pairs"],
        "dedup_containment": q["dedup_containment"],
    }


def _synthesize_events(spark, out_dir: str) -> None:
    """10x events: user_id and event_id offset per replica, timestamps and
    per-user histories untouched — 10x the users, identical per-user
    structure, so per-key-state operators (funnel, retention, sessions,
    rolling windows, grouped regression) produce exactly 10x the output
    and their ratio measures the keyed-exchange plan."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_event = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    (ev.crossJoin(reps)
     .select((F.col("event_id") + F.col("_r") * n_event).alias("event_id"),
             "ts",
             (F.col("user_id") + F.col("_r") * n_user).alias("user_id"),
             "event_type", "value", "props")
     .repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/events.parquet"))


def _event_flagships():
    """Per-user-state operators over the events table — the streaming-
    shaped family whose 100 TB story is 'state per key, keyed exchanges
    only'. All linear-output under user-offset replication."""
    import __spark_entry__ as em
    q = em.queries()
    return {
        "event_funnel": q["event_funnel"],
        "events_retention": q["events_retention"],
        "events_sessionize": q["events_sessionize"],
        "events_rolling_7d": q["events_rolling_7d"],
        "user_spend_trend": q["user_spend_trend"],
    }


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

    def probe(flagships, dir_1x, dir_10x, results, count_rows=False):
        for name, fn in flagships.items():
            times, rows = {}, {}
            for label, d in (("1x", dir_1x), (f"{REPLICAS}x", dir_10x)):
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    spark._jvm.System.gc()
                    t0 = time.perf_counter()
                    run(fn(spark, d))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                times[label] = round(best, 3)
                if count_rows:
                    rows[f"rows_{label}"] = fn(spark, d).count()
            ratio = round(times[f"{REPLICAS}x"] / times["1x"], 2)
            results[name] = {**times, "ratio": ratio, **rows}
            extra = (f" rows {rows.get('rows_1x')}->{rows.get(f'rows_{REPLICAS}x')}"
                     if count_rows else "")
            print(f"{name}: 1x={times['1x']}s {REPLICAS}x="
                  f"{times[f'{REPLICAS}x']}s ratio={ratio}{extra}", flush=True)

    scratch = tempfile.mkdtemp(prefix="gsed_scale_")
    results = {}
    try:
        _synthesize(spark, scratch)
        probe(_flagships(), SF_DIR, scratch, results)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # per-user-state events family: 10x users, identical per-user history.
    event_results = {}
    sev = tempfile.mkdtemp(prefix="gsed_scale_ev_")
    try:
        _synthesize_events(spark, sev)
        probe(_event_flagships(), SF_DIR, sev, event_results,
              count_rows=True)
    finally:
        shutil.rmtree(sev, ignore_errors=True)

    # pair-producing dedup family: both scales use the word-tagged corpus
    # (1 replica vs REPLICAS replicas) so tokenization cost is identical
    # and only the data volume changes; row counts prove output stayed
    # ~linear (the prerequisite for the time ratio to mean anything).
    pair_results = {}
    s1 = tempfile.mkdtemp(prefix="gsed_scale_pair1_")
    s10 = tempfile.mkdtemp(prefix="gsed_scale_pair10_")
    try:
        _synthesize_disjoint(spark, s1, 1)
        _synthesize_disjoint(spark, s10, REPLICAS)
        probe(_pair_flagships(), s1, s10, pair_results, count_rows=True)
    finally:
        shutil.rmtree(s1, ignore_errors=True)
        shutil.rmtree(s10, ignore_errors=True)
    out = {"replicas": REPLICAS, "results": results,
           "event_results": event_results, "pair_results": pair_results}
    print(json.dumps(out))
    # In-repo auditable artifact, same pattern as SELFCHECK/FETCHCHECK.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
