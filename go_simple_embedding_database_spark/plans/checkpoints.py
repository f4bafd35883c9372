"""Deterministic release of localCheckpoint storage.

``DataFrame.unpersist()`` does NOT free a localCheckpoint's blocks: the
checkpoint persists the underlying RDD directly (MEMORY_AND_DISK), not
a CacheManager entry, so ``unpersist`` is a silent no-op and release is
otherwise GC-driven (the ContextCleaner reacts, asynchronously, to the
JVM collecting the RDD reference — measured in this repo: five chained
lazy checkpoints stayed pinned through an explicit Python gc). Iterative
operators that chain one checkpoint per superstep (BPE's merge loop at
K=10k-32k merges, PageRank-style label propagation) would otherwise
retain O(K x vocabulary) blocks in executor storage.

A checkpointed DataFrame plans as a ``LogicalRDD`` leaf that holds the
persisted RDD itself — unpersisting THAT reference frees the blocks
immediately (verified against ``sc.getPersistentRDDs`` on pyspark
4.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the storage behind a localCheckpointed ``df`` NOW instead of
    at some future GC. Returns True if a persisted LogicalRDD was found
    and unpersisted (non-blocking), False otherwise — callers treat a
    False as 'nothing to do', so passing a non-checkpointed frame is
    harmless. Only call once the checkpoint's DOWNSTREAM consumers are
    themselves materialized: the blocks are the frame's only storage and
    its lineage is truncated, so a later action on a released frame (or
    a frame derived from it that has not materialized its own
    checkpoint) would fail with missing blocks."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        rdd = plan.rdd()
        if rdd.getStorageLevel().useMemory() or \
                rdd.getStorageLevel().useDisk():
            rdd.unpersist(False)
            return True
        return False
    except Exception:
        # py4j internals moved (Spark upgrade): degrade to the GC-driven
        # release every checkpoint already has, never break the operator
        return False
