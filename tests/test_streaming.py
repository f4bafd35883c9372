"""Structured Streaming ingest: file source → embed → dedup → parquet sink,
driven with availableNow triggers; windowed aggregation batch/stream parity."""

import json
import os

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.sources.tables import load_table
from go_simple_embedding_database_spark.streaming.ingest import (
    streaming_ingest,
    windowed_event_counts,
)


def _write_batch(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_ingest_dedups_and_embeds(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(src, "b1.json", [
        {"id": "a", "blob": "first doc", "ts": "2026-01-01T00:00:00Z"},
        {"id": "b", "blob": "second doc", "ts": "2026-01-01T00:00:01Z"},
        {"id": "a", "blob": "first doc", "ts": "2026-01-01T00:00:00Z"},  # dup
    ])
    q = streaming_ingest(spark, src, sink, ckpt, "mock-hash-64", "streamed")
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {"a", "b"}                     # duplicate dropped
    assert rows["a"].collection_id == "streamed"
    assert len(rows["a"].embedding) == 64

    # restartability: a second batch with one old id and one new id —
    # the checkpoint resumes, within-batch dedup applies again.
    _write_batch(src, "b2.json", [
        {"id": "c", "blob": "third doc", "ts": "2026-01-01T00:10:00Z"},
    ])
    q2 = streaming_ingest(spark, src, sink, ckpt, "mock-hash-64", "streamed")
    q2.awaitTermination(120)
    assert {r.id for r in spark.read.parquet(sink).collect()} == {"a", "b", "c"}


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    """The same code path aggregates a batch DataFrame — the oracle the
    driver can check; streaming adds only watermark state semantics."""
    events = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(events, window="1 hour")
    total = out.agg(F.sum("n_events").alias("n")).collect()[0].n
    assert total == events.count()
    # windows are aligned hours
    assert all(r.window_start.minute == 0 for r in out.limit(10).collect())


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    """Drive the SAME aggregation as a real stream from a file source with
    availableNow, complete mode into a memory sink."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.limit(200).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) n from win_counts").collect()[0].n
    assert got == 200
