"""Structured Streaming ingest — the extension the reference roadmap never
shipped ("auto backup", "concurrency support": /root/reference/README.md:147,150
are future work; the reference is strictly request/response).

Two composable pieces:

- ``streaming_ingest``: file-source stream of blob rows → embed (same
  batched embedder surface as batch ingest) → watermark + dropDuplicates
  on record id (exactly-once-per-id within the watermark horizon) →
  partitioned parquet sink with checkpointing. At scale this is the
  standard continuous-ingest topology: source → dedup → partitioned
  append, restartable from the checkpoint.
- ``windowed_event_counts``: tumbling-window aggregation with late-data
  watermark over an events-shaped stream — the canonical stateful op.

Both return the DataFrame/StreamingQuery rather than managing a session,
so tests drive them with ``trigger(availableNow=True)`` and production
runs them continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery



def embed_stream(stream: DataFrame, embedder_id: str, blob_col: str = "blob",
                 id_col: str = "id") -> DataFrame:
    """Attach embeddings to a streaming DataFrame of blobs — the SAME
    record-shaping code as batch ``make_records`` (``database
    .shape_records``), so the streaming records table can never diverge
    from the batch one; the pandas_udf runs per micro-batch,
    Arrow-batched."""
    from go_simple_embedding_database_spark.database import shape_records
    return shape_records(stream, embedder_id, blob_col, id_col)


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet event tables surface
    TIMESTAMP_NTZ (and sources may hand us DATE). Normalize in BOTH batch
    and streaming paths so a stream and its batch oracle agree on values
    and types."""
    if df.schema[ts_col].dataType.typeName() in ("timestamp_ntz", "date"):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def dedup_stream(stream: DataFrame, event_time_col: str, watermark: str = "10 minutes",
                 keys: list[str] | None = None) -> DataFrame:
    """Exactly-once-per-KEY within the watermark horizon: late duplicates
    beyond the watermark age out of state instead of growing it forever —
    the only state-bounded way to run continuous dedup.

    Uses ``dropDuplicatesWithinWatermark`` on the keys alone: deduping on
    (keys + event_time) would re-admit a producer retry that refreshed the
    timestamp — the common at-least-once-delivery case this operator
    exists to absorb. The batch path dedups on the keys for the same
    per-key semantics."""
    stream = _as_event_time(stream, event_time_col)
    keys = keys or ["id"]
    if stream.isStreaming:
        return (stream.withWatermark(event_time_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return stream.dropDuplicates(keys)


def streaming_ingest(spark, source_dir: str, sink_dir: str, checkpoint_dir: str,
                     embedder_id: str, collection_id: str,
                     schema: str = "id string, blob string, ts timestamp",
                     watermark: str = "10 minutes",
                     available_now: bool = True) -> StreamingQuery:
    """File-source streaming ingest into a partitioned records table."""
    raw = (spark.readStream.schema(schema).json(source_dir))
    deduped = dedup_stream(raw, "ts", watermark, keys=["id"])
    records = embed_stream(deduped, embedder_id).withColumn(
        "collection_id", F.lit(collection_id)
    )
    writer = (
        records.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("collection_id")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_index_ingest(spark, source_dir: str, index_path: str,
                           checkpoint_dir: str, embedder_id: str,
                           centroids: DataFrame,
                           schema: str = "id string, blob string, ts timestamp",
                           available_now: bool = True) -> StreamingQuery:
    """Continuous ANN-index maintenance: stream of blobs → embed (Arrow
    batched) → nearest-centroid cell assignment (centroids broadcast) →
    append into the cell-partitioned IVF index of ``operators.ann``.

    Uses ``foreachBatch`` because the sink is a partitioned-parquet APPEND
    keyed by a computed column — each micro-batch runs the same batch
    assignment code (no streaming/batch divergence) and appends only the
    partitions it touches. Queries via ``ann.ivf_query_index`` see new
    vectors as soon as the micro-batch commits."""
    from go_simple_embedding_database_spark.operators.ann import assign_cells_by_id

    raw = spark.readStream.schema(schema).json(source_dir)
    records = embed_stream(raw, embedder_id)

    def _append_batch(batch: DataFrame, _batch_id: int) -> None:
        cells = assign_cells_by_id(batch, centroids, "id", "embedding")
        cells.write.mode("append").partitionBy("cell").parquet(f"{index_path}/cells")

    writer = (records.writeStream.foreachBatch(_append_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key_col: str = "user_id", ts_col: str = "ts",
                         lower: str = "30 minutes", upper: str = "0 seconds",
                         watermark: str = "1 hour",
                         suffix: str = "_r") -> DataFrame:
    """Stream-stream inner join bounded by key equality AND an event-time
    interval: a left event matches right events of the same key with
    ``r.ts`` in [l.ts - lower, l.ts + upper]. Both sides carry watermarks,
    so the join state for a key ages out once the watermark passes the
    interval — state ∝ in-flight window, never history (the only safe way
    to join two unbounded streams). Works identically on batch DataFrames
    (same expression, no watermark), which is what the batch-twin test
    asserts."""
    def prep(df: DataFrame) -> DataFrame:
        df = _as_event_time(df, ts_col)
        return df.withWatermark(ts_col, watermark) if df.isStreaming else df

    l = prep(left).alias("l")
    r = prep(right).select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns]).alias("r")
    rts, lts = F.col(f"{ts_col}{suffix}"), F.col(f"l.{ts_col}")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"{key_col}{suffix}"))
        & (rts >= lts - F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def sessionize(events: DataFrame, gap: str = "10 minutes",
               key_col: str = "user_id", ts_col: str = "ts",
               watermark: str = "30 minutes") -> DataFrame:
    """Session windows per key: events within ``gap`` of the previous event
    merge into one session. Spark merges on TOUCHING boundaries too — an
    event at exactly previous + gap still extends the session; a new
    session starts only when the gap is strictly exceeded. Works on a
    stream (stateful session
    aggregation with watermark eviction) and on a batch DataFrame — the
    same ``session_window`` expression, which is what makes it
    oracle-checkable in batch mode."""
    events = _as_event_time(events, ts_col)
    src = (
        events.withWatermark(ts_col, watermark) if events.isStreaming else events
    )
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("session_start"),
                key_col, "n_events", "sum_value")
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts") -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark — works on
    both a stream (stateful, incremental) and a batch DataFrame (the same
    code path the oracle checks)."""
    events = _as_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming else events
    ).groupBy(
        F.window(F.col(ts_col), window).alias("w"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


def streaming_upsert(spark, source_dir: str, table_path: str,
                     checkpoint_dir: str, keys: list[str],
                     schema: str = "id bigint, text string, ts timestamp",
                     event_time_col: str = "ts",
                     available_now: bool = True,
                     transactional: bool = False) -> StreamingQuery:
    """Continuous MERGE: a stream of change rows upserts into a parquet
    table via ``foreachBatch`` — the streaming twin of
    ``sources.maintenance.upsert``, and the pattern Delta's
    MERGE-into-stream executes transactionally.

    Semantics: the MAX-event-time version of each key wins across
    EVERYTHING ever seen (base table rows carry their event time, so a
    late-arriving older change cannot regress a newer row — the
    at-least-once/late-file case). Event-time ties break on a content
    hash, which is deterministic under foreachBatch replay (a replayed
    batch picks the same winner, keeping the sink idempotent).

    Two sinks:
    - ``transactional=True`` — the table is a ``sources.txn``
      manifest-committed versioned table: each micro-batch commits a new
      version atomically (O_EXCL manifest claim), readers get snapshot
      isolation with NO visibility window, and every prior micro-batch
      state remains time-travelable until vacuum. Read it with
      ``txn.read_version``.
    - default — plain parquet directory with move-aside/move-in swap
      plus crash recovery. A concurrent reader can still catch the
      table mid-swap; kept as the lowest-common-denominator sink for
      readers that insist on ``spark.read.parquet(table_path)``.

    State is bounded either way: nothing is held in the streaming state
    store — the table itself is the state."""
    import os
    import shutil

    from go_simple_embedding_database_spark.sources import txn

    raw = spark.readStream.schema(schema).json(source_dir)
    old_path = f"{table_path}__old"

    def _read_base(spark_l):
        if transactional:
            if txn.latest_version(table_path) is None:
                return None
            return txn.read_version(spark_l, table_path)
        if os.path.isdir(table_path):
            return spark_l.read.parquet(table_path)
        return None

    def _merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if not transactional and os.path.isdir(old_path):
            # Crash recovery for the plain sink: died between move-aside
            # and move-in (aside copy IS the table), or between move-in
            # and cleanup (aside copy is stale and must go, or the next
            # move-aside would nest into it).
            if os.path.isdir(table_path):
                shutil.rmtree(old_path)
            else:
                shutil.move(old_path, table_path)
        spark_l = batch.sparkSession
        base = _read_base(spark_l)
        allrows = batch if base is None else base.unionByName(batch)
        tiebreak = F.md5(F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in batch.columns]))
        # max_by with a (event_time, content-hash) struct ordering key,
        # not a row_number window: the aggregate partial-combines
        # map-side, so the key exchange carries one winner candidate per
        # key per input partition instead of every base+batch row (the
        # base table re-reads dominate this merge's data volume — same
        # shuffle-volume argument as operators/dedup.exact_dedup_keep).
        # Lexicographic struct max == ORDER BY time DESC, hash DESC.
        cols = allrows.columns
        merged = (allrows
                  .groupBy(*keys)
                  .agg(F.max_by(F.struct(*cols),
                                F.struct(F.col(event_time_col),
                                         tiebreak)).alias("_w"))
                  .select("_w.*"))
        if transactional:
            txn.commit_version(spark_l, merged, table_path)
            return
        tmp = f"{table_path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        had_table = os.path.isdir(table_path)
        if had_table:
            shutil.move(table_path, old_path)
        shutil.move(tmp, table_path)
        if had_table:
            shutil.rmtree(old_path)  # deliberate: failure must surface

    writer = (raw.writeStream.foreachBatch(_merge_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_ingest(spark, source_dir: str, corpus_dir: str,
                           index_dir: str, checkpoint_dir: str,
                           schema: str = "doc_id bigint, text string",
                           threshold: float = 0.7,
                           available_now: bool = True) -> StreamingQuery:
    """Self-growing near-dup-free corpus ingest — the streaming twin of
    ``dedup.probe_band_index``. Each micro-batch:

    1. drops batch-internal near-dups (keep the smallest id per
       near-dup pair, ``minhash_dedup`` pairs);
    2. probes the PERSISTED band index of everything ingested so far —
       the accumulated corpus is never re-shingled, exactly the
       incremental batch contract;
    3. appends the kept documents to the corpus and their bands to the
       index, so batch N+1 dedups against batch N without any rebuild.

    Delivery contract, stated honestly: the keep-set computation is
    deterministic, but the two appends are not atomic — a crash between
    them (or a replayed batch) can duplicate rows in corpus/index files.
    Exactly-once needs the manifest layer (``sources.txn``), the same
    upgrade ``streaming_upsert`` documents; this operator keeps the
    plain-parquet shape because the dedup SEMANTICS are what it exists
    to pin down.
    """
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.operators.dedup import (
        lsh_bands, minhash_dedup, probe_band_index)

    raw = spark.readStream.schema(schema).json(source_dir)

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.persist()
        try:
            # (1) intra-batch: a doc near-duplicating a SMALLER id loses.
            losers = (minhash_dedup(batch, threshold=threshold)
                      .select(F.col("id_b").alias("doc_id")).distinct())
            kept = batch.join(losers, "doc_id", "left_anti")
            # (2) cross-batch: probe the accumulated index. Only the
            # documented first-batch case (no index written yet) skips the
            # probe — an explicit existence check, NOT a broad except: a
            # corrupt index or failing read must kill the batch, because
            # silently skipping the probe would admit duplicates into the
            # "dedup-free" corpus with no signal.
            import os
            if os.path.exists(index_dir):
                idx = spark.read.parquet(index_dir)
                corpus = spark.read.parquet(corpus_dir)
                dup = (probe_band_index(kept, idx, corpus,
                                        threshold=threshold)
                       .select(F.col("new_id").alias("doc_id")).distinct())
                kept = kept.join(dup, "doc_id", "left_anti")
            kept = kept.persist()
            # (3) grow corpus + index with what survived.
            kept.write.mode("append").parquet(corpus_dir)
            lsh_bands(kept).write.mode("append").parquet(index_dir)
            kept.unpersist()
        finally:
            batch.unpersist()

    writer = (raw.writeStream.foreachBatch(_ingest)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_batch_moments(batch: DataFrame, batch_id: int, moments_path: str,
                        vec_col: str = "embedding", dim: int = 64) -> None:
    """One micro-batch of the streaming-moments maintenance (round 9):
    compute the batch's EXACT integer embedding moments
    (operators/pca.embedding_moments) and write them under their own
    ``batch_id=N`` partition with DYNAMIC partition overwrite. The
    partition-per-batch layout is what makes foreachBatch's
    at-least-once replay safe for an ADDITIVE statistic: a
    crashed-and-replayed batch OVERWRITES its own partition instead of
    double-counting into a running total (the same replay-idempotence
    argument as streaming_upsert's deterministic merge, adapted to
    sums). Exposed at module level so tests can replay it directly."""
    from ..operators.pca import embedding_moments
    (embedding_moments(batch, vec_col, dim)
     .withColumn("batch_id", F.lit(int(batch_id)))
     .repartition(1)  # d(d+3)/2+1 tiny rows — one file per batch
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(moments_path))


def streaming_moments(spark, source_dir: str, moments_path: str,
                      checkpoint_dir: str,
                      schema: str = "vec_id long, embedding array<double>",
                      vec_col: str = "embedding", dim: int = 64,
                      available_now: bool = True) -> StreamingQuery:
    """Maintain running embedding moments over a vector stream — the
    streaming face of the incremental covariance path
    (operators/pca.merge_moments): each micro-batch appends ONLY its
    own d(d+3)/2+1-row moments partition; nothing ever rescans history,
    and :func:`read_running_moments` folds the partitions into the
    exact union moments on demand. Covariance/PCA over a growing corpus
    therefore costs O(batches·d²) storage and a tiny groupBy-sum to
    read, instead of a full recompute per refresh."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (stream.writeStream
              .foreachBatch(lambda b, i: write_batch_moments(
                  b, i, moments_path, vec_col, dim))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _effective_moments(df: DataFrame) -> DataFrame:
    """The de-duplicated view of a moments store that may hold compacted
    partitions: a compacted partition carries ``batch_id = -(W+1)`` and
    SUPERSEDES every batch partition with id ≤ W and every older
    compacted partition. Selecting (newest compacted) ∪ (batches > its
    watermark) makes reads correct even when a crashed compaction left
    superseded partitions behind — deletion is garbage collection, not
    a correctness step."""
    wmax = F.max(F.when(F.col("batch_id") < 0, -F.col("batch_id") - 1))
    w = df.agg(F.coalesce(wmax, F.lit(-1)).alias("_w"))
    return (df.crossJoin(F.broadcast(w))
            .filter((F.col("batch_id") == -(F.col("_w") + 1))
                    | (F.col("batch_id") > F.col("_w")))
            .drop("_w"))


def read_running_moments(spark, moments_path: str) -> DataFrame:
    """The union moments of every batch ingested so far: merge the
    per-batch partitions (bigint additivity — bit-exact vs a full
    recompute, tests/test_pca.py) into the (dim_i, dim_j, v) relation
    operators/pca.covariance_from_moments / pca_components consume.
    Compaction-aware (round 10): partitions superseded by a
    :func:`compact_moments` consolidation are excluded, so the fold
    touches O(batches-since-compaction) partitions instead of one per
    micro-batch over the stream's whole life."""
    per_batch = _effective_moments(spark.read.parquet(moments_path))
    return (per_batch.drop("batch_id")
            .groupBy("dim_i", "dim_j").agg(F.sum("v").alias("v")))


def safe_compaction_watermark(spark, checkpoint_dir: str) -> int:
    """The highest micro-batch id that can safely be folded by
    :func:`compact_moments`: the newest batch with a COMMIT entry in
    the streaming checkpoint. Structured Streaming writes
    ``<ckpt>/offsets/N`` before running batch N and ``<ckpt>/commits/N``
    after it succeeds; on recovery only an offsets-without-commit batch
    is replayed (with the same id). A committed batch can therefore
    never be re-run by this checkpoint — folding it cannot be undone by
    a replay resurrecting its partition. Returns -1 when nothing has
    committed (compact_moments at -1 folds nothing). This closes the
    'derive the horizon from the commit log' step the compaction
    contract documents — callers chain
    ``compact_moments(spark, path, safe_compaction_watermark(spark,
    ckpt))`` after (or between) ingestion runs."""
    sc = spark.sparkContext
    jvm = sc._jvm
    commits = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/commits")
    fs = commits.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(commits):
        return -1
    best = -1
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if name.isdigit():
            best = max(best, int(name))
    return best


def compact_moments(spark, moments_path: str, watermark: int) -> None:
    """Fold every moments partition with ``batch_id ≤ watermark`` (and
    any older compacted partition) into ONE consolidated partition —
    the small-files relief for a long-lived moments stream (VERDICT
    r09 #5): without it a stream accumulates one file+partition per
    micro-batch forever, and every :func:`read_running_moments` pays
    the listing + fold cost of the full history.

    Layout contract: the consolidated partition is written under
    ``batch_id = -(watermark + 1)`` (real batch ids are ≥ 0, so the
    sign is the marker and the id encodes the covered horizon). Reads
    ignore everything a newer compacted partition supersedes
    (:func:`_effective_moments`), which makes the operation
    crash-safe and replay-idempotent: a compaction that wrote its
    partition but died before cleanup leaves a store that reads
    IDENTICALLY, and re-running the same compaction overwrites the
    same partition with the same bit-exact sums (bigint additivity —
    the merge_moments proof). Cleanup of superseded partition
    directories happens last, via the Hadoop FileSystem API (works on
    any scheme, not just file://).

    ``watermark`` must be ≥ the horizon of the newest existing
    compaction (compactions only move forward) and should trail the
    stream's live batches — only micro-batches that can no longer be
    REPLAYED by the checkpointed query may be folded (a replay of
    batch N overwrites partition ``batch_id=N``; if N were already
    folded the replay would resurrect it as a double count). In
    practice: compact up to (last committed batch − the sink's replay
    horizon), e.g. from the checkpoint's commit log."""
    if watermark < 0:
        # nothing committed yet (safe_compaction_watermark returned -1)
        # — folding nothing is a no-op, and -(watermark+1) would collide
        # with real batch id 0
        return
    df = spark.read.parquet(moments_path)
    ids = [r.batch_id for r in df.select("batch_id").distinct().collect()]
    prev_w = max((-i - 1 for i in ids if i < 0), default=-1)
    if watermark < prev_w:
        raise ValueError(
            f"compact_moments: watermark {watermark} is behind the "
            f"existing compaction horizon {prev_w} — compactions only "
            "move forward")
    folded = (_effective_moments(df)
              .filter(F.col("batch_id") <= watermark)
              .drop("batch_id")
              .groupBy("dim_i", "dim_j").agg(F.sum("v").alias("v"))
              .withColumn("batch_id", F.lit(-(watermark + 1))))
    (folded.repartition(1)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(moments_path))
    # GC: drop superseded partition dirs (batches ≤ watermark, older
    # compactions). Correctness never depends on this step succeeding.
    sc = spark.sparkContext
    jvm = sc._jvm
    root = jvm.org.apache.hadoop.fs.Path(moments_path)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        bid = int(name.split("=", 1)[1])
        if bid == -(watermark + 1):
            continue
        if bid < 0 or bid <= watermark:
            fs.delete(st.getPath(), True)
