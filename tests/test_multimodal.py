"""Multimodal plumbing: schemas, Arrow batch shapes, quarantine path.
The decoder is a documented stub; everything Spark-side is real."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, documents):
    return mm.documents_as_media(documents.limit(50))


def test_media_schema(media):
    assert media.columns == ["media_id", "modality", "payload", "mime_type", "meta"]
    assert dict(media.dtypes)["payload"] == "binary"


def test_metadata_without_decode(spark, media):
    meta = mm.media_metadata(media)
    rows = meta.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 for r in rows)
    assert all(len(r.payload_sha256) == 64 for r in rows)
    # no Python in the plan — metadata is the scan-everything operator
    from go_simple_embedding_database_spark.plans.explain_utils import formatted_plan
    assert "EvalPython" not in formatted_plan(meta)


def test_decode_media_deterministic(spark, media):
    d1 = {r.media_id: (r.width, r.height, tuple(r.feature)) for r in mm.decode_media(media).collect()}
    d2 = {r.media_id: (r.width, r.height, tuple(r.feature)) for r in mm.decode_media(media).collect()}
    assert d1 == d2
    w, h, feat = next(iter(d1.values()))
    assert 16 <= w <= 255 and 16 <= h <= 255
    assert len(feat) == mm.FEATURE_DIM
    assert sum(f * f for f in feat) == pytest.approx(1.0)


def test_decode_quarantines_empty_payload(spark):
    bad = spark.createDataFrame(
        [("ok", "image", b"payload"), ("empty", "image", b"")],
        "media_id string, modality string, payload binary",
    )
    out = mm.decode_media(bad)
    rows = {r.media_id: r for r in out.collect()}
    assert rows["ok"].feature is not None
    assert rows["empty"].feature is None  # quarantined, not crashed


def test_decode_raise_mode(spark):
    bad = spark.createDataFrame(
        [("empty", "image", b"")], "media_id string, modality string, payload binary")
    with pytest.raises(Exception):
        mm.decode_media(bad, on_error="raise").collect()


def test_video_frame_sample_plan(spark, documents):
    vids = mm.documents_as_media(documents.limit(10), modality="video")
    frames = mm.frame_sample_plan(vids, every_nth=10)
    rows = frames.collect()
    assert len(rows) >= 10                       # at least frame 0 per video
    assert all(r.frame_no % 10 == 0 for r in rows)


def test_decoded_features_feed_ann(spark, media):
    """Decoded features compose with the similarity operators — media
    near-dup via cosine over stub features."""
    from go_simple_embedding_database_spark.operators.dedup import cosine_neardup_pairs

    feats = mm.decode_media(media).select("media_id", F.col("feature").alias("embedding"))
    # identical payloads → identical stub features → cosine 1.0 pairs
    doubled = feats.union(feats.withColumn("media_id", F.concat(F.col("media_id"), F.lit("_copy"))))
    pairs = cosine_neardup_pairs(doubled, id_col="media_id", threshold=0.999999)
    assert pairs.count() >= 50
