"""plans/checkpoints.release_local_checkpoint — the deterministic
localCheckpoint storage release BPE's merge loop depends on.

The helper reaches through py4j internals (queryExecution().analyzed(),
LogicalRDD.rdd()) and deliberately degrades to False when they move
(a Spark upgrade). That degrade is SILENT by design for operators — so
this module is the version-pinned canary (VERDICT r09): it asserts the
helper actually RETURNS TRUE on a freshly materialized checkpoint, which
fails loudly on the Spark that moved the internals instead of quietly
reverting BPE training to GC-driven release (unbounded executor storage
growth at real merge depths)."""

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.plans.checkpoints import (
    release_local_checkpoint)


def _persistent_rdd_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def test_release_returns_true_on_fresh_checkpoint_and_frees_blocks(spark):
    """The canary: True on a materialized localCheckpoint, and the
    persistent-RDD census actually shrinks back to where it started —
    a False here means the py4j path broke (Spark upgrade) and the
    deterministic release silently became a no-op."""
    before = _persistent_rdd_ids(spark)
    df = (spark.range(1000).withColumn("v", F.col("id") * 2)
          .localCheckpoint(eager=True))
    assert df.count() == 1000
    mid = _persistent_rdd_ids(spark)
    assert mid - before, "materialized checkpoint did not pin an RDD"
    assert release_local_checkpoint(df) is True, (
        "release_local_checkpoint returned False on a fresh "
        "localCheckpoint — the py4j internals it relies on moved; "
        "BPE's merge loop has silently reverted to GC-driven release")
    assert _persistent_rdd_ids(spark) == before


def test_release_is_false_on_non_checkpointed_frame(spark):
    """Callers treat False as 'nothing to do' — a plain frame must not
    raise (and must not unpin anything)."""
    before = _persistent_rdd_ids(spark)
    df = spark.range(10).withColumn("v", F.col("id") + 1)
    assert release_local_checkpoint(df) is False
    assert _persistent_rdd_ids(spark) == before


def test_release_on_lazy_unmaterialized_checkpoint_is_safe(spark):
    """A lazy checkpoint that never ran holds no blocks, but its RDD
    already carries the persist MARK (storage level is set at plan
    time) — the helper removes the mark (returns True) and must not
    throw; the census is unchanged because nothing ever pinned."""
    before = _persistent_rdd_ids(spark)
    df = spark.range(10).localCheckpoint(eager=False)
    # note: no action between checkpoint and release
    assert release_local_checkpoint(df) is True
    assert _persistent_rdd_ids(spark) == before
