"""Engine-measured exchange audit — what a plan's shuffles ACTUALLY moved.

At 100 TB the cost of a plan is dominated by its exchanges, and the only
trustworthy record of what an exchange moved is Spark's own SQL metrics:
wall time on a shared box is draw-unstable, and hand-derived row ratios
can describe a plan that never ran (round-8 lesson: a dim predicate on
the join key was silently inferred onto the fact scan by Catalyst's
InferFiltersFromConstraints, so the "unpruned" baseline never shuffled
the full fact side — the metrics caught it, the hand ratio had not).

``exchange_metrics`` executes a DataFrame and walks the FINAL adaptive
physical plan (descending through AQE's QueryStage wrappers, which hide
their subtrees from ``children()``), returning every ShuffleExchange's
``shuffleRecordsWritten`` / ``shuffleBytesWritten`` plus totals. Used by
``tools/scale_probe.py`` for the bloom A/B record and available to any
caller auditing a shuffle-reduction claim (the load-invariant evidence
the tests and SCALE.json lean on).

No counterpart in the reference (SURVEY.md §2 extensions): the 544-LoC
surface has no plan introspection of any kind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exchange_metrics(df: DataFrame) -> dict:
    """Execute ``df`` (a cheap ``collect`` — call on an aggregated or
    limited frame) and return its shuffle-exchange metrics:

    ``{"shuffle_records_total", "shuffle_bytes_total",
       "max_exchange_records", "n_exchanges",
       "per_exchange": [{"records", "bytes"}, ...]}``

    Broadcast exchanges move no shuffle rows and are not counted;
    ``ReusedExchange`` nodes are skipped (their metrics live on the
    original). Per-exchange order is the plan walk order (top-down)."""
    df.collect()

    exchanges: list[dict] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:      # Shuffle/Broadcast/ResultQueryStage
            walk(node.plan())         # the subtree hides behind .plan()
            return
        if name == "Exchange":        # ShuffleExchangeExec
            m = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            exchanges.append(
                {"records": int(m.get("shuffleRecordsWritten", 0)),
                 "bytes": int(m.get("shuffleBytesWritten", 0))})
        if name == "ReusedExchange":
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return {
        "shuffle_records_total": sum(e["records"] for e in exchanges),
        "shuffle_bytes_total": sum(e["bytes"] for e in exchanges),
        "max_exchange_records": max((e["records"] for e in exchanges),
                                    default=0),
        "n_exchanges": len(exchanges),
        "per_exchange": exchanges,
    }
