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


class TestResizeMedia:
    def test_resizes_images_passes_audio(self, spark, documents):
        from go_simple_embedding_database_spark.operators.multimodal import (
            documents_as_media, resize_media)
        media = documents_as_media(documents.limit(20))
        audio = documents_as_media(documents.limit(5), modality="audio") \
            .withColumn("media_id", F.concat(F.lit("a"), F.col("media_id")))
        out = resize_media(media.unionByName(audio), 64, 48).collect()
        rows = {r.media_id: r for r in out}
        assert len(rows) == 25
        img = [r for r in out if r.modality == "image"]
        assert all((r.width, r.height) == (64, 48) for r in img)
        assert all(r.payload is not None for r in img)
        aud = [r for r in out if r.modality == "audio"]
        assert all(r.width is None and r.payload is not None for r in aud)

    def test_deterministic_and_size_scales(self, spark, documents):
        from go_simple_embedding_database_spark.operators.multimodal import (
            documents_as_media, resize_media)
        media = documents_as_media(documents.limit(5))
        a = {r.media_id: bytes(r.payload)
             for r in resize_media(media, 64, 48).collect()}
        b = {r.media_id: bytes(r.payload)
             for r in resize_media(media, 64, 48).collect()}
        assert a == b  # deterministic across runs
        big = {r.media_id: bytes(r.payload)
               for r in resize_media(media, 256, 192).collect()}
        assert all(len(big[k]) > len(a[k]) for k in a)  # area-scaled bytes

    def test_quarantine_and_raise(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            resize_media)
        df = spark.createDataFrame(
            [("m1", "image", b"ok-bytes"), ("m2", "image", b"")],
            "media_id string, modality string, payload binary")
        out = {r.media_id: r for r in resize_media(df, 32, 32).collect()}
        assert out["m1"].payload is not None
        assert out["m2"].payload is None  # quarantined
        import pytest as _pytest
        with _pytest.raises(Exception):
            resize_media(df, 32, 32, on_error="raise").collect()
        with _pytest.raises(ValueError):
            resize_media(df, 0, 32)


def test_no_corpus_text_sniffs_as_media(documents):
    """multimodal_decode's DuckDB oracle models ONLY the sha256 fallback
    branch; if any document text sniffed as a real container it would be
    routed to the real codec (quarantine on parse failure) and the gate
    would diverge. The strict sniff (BMP needs a valid DIB header size,
    PNM a digit after the magic, WAV the 12-byte RIFF/WAVE sandwich)
    makes ASCII prose effectively unsniffable — assert it holds for the
    whole test corpus."""
    from go_simple_embedding_database_spark.functions.codecs import (
        sniff_format)

    texts = [r.text for r in documents.select("text").collect()]
    sniffed = [t[:20] for t in texts
               if sniff_format(t.encode("utf-8")) is not None]
    assert not sniffed, f"corpus text sniffed as media: {sniffed[:3]}"


class TestMixedFormatPipeline:
    """End-to-end over REAL encoded media of every supported container:
    one Spark decode_media pass over a mixed-format batch must produce
    true dimensions/frame counts and pixel-derived features for all of
    them, with only the genuinely-undecodable rows falling back to the
    sha fake. Pins the production shape: heterogeneous corpora hit ONE
    mapInPandas stage, not per-format jobs."""

    def _mixed_rows(self):
        import numpy as np
        from go_simple_embedding_database_spark.functions import codecs
        rng = np.random.default_rng(41)
        img = (rng.integers(0, 4, size=(16, 12, 3)) * 64).astype(np.uint8)
        wav = (b"RIFF" + (36 + 200).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
               + b"data" + (200).to_bytes(4, "little") + bytes(200))
        frames = [np.roll(img, t, axis=1) for t in range(6)]
        return {
            "ppm": ("image", codecs.encode_ppm(img)),
            "jpeg_base": ("image", codecs.encode_jpeg(img, quality=90)),
            "jpeg_prog": ("image",
                          codecs.encode_jpeg(img, quality=90, progressive=True)),
            "gif_anim": ("video", codecs.encode_gif(frames)),
            "avi_mjpeg": ("video", codecs.encode_avi_mjpeg(frames)),
            "wav_pcm": ("audio", wav),
            "tiff_lzw": ("image", codecs.encode_tiff(
                img, compression="lzw", predictor=2)),
            # sniffs as mp4 but has no moov (fragmented/truncated) ->
            # plain quarantine under the r05 quarantine-with-metadata
            # routing (parse_mp3/parse_mp4 wired in)
            "mp4_like": ("video", b"\x00\x00\x00\x18ftypisom" + bytes(64)),
            # sniffs as NOTHING -> the deterministic sha fake
            "opaque": ("video", b"completely unrecognizable payload bytes"),
        }

    def test_one_pass_mixed_decode(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            decode_media)
        rows = self._mixed_rows()
        df = spark.createDataFrame(
            [(k, m, bytearray(p)) for k, (m, p) in rows.items()],
            "media_id string, modality string, payload binary")
        out = {r.media_id: r for r in decode_media(df).collect()}
        assert len(out) == len(rows)
        # true dimensions for every real container
        for k in ("ppm", "jpeg_base", "jpeg_prog", "tiff_lzw"):
            assert (out[k].width, out[k].height, out[k].n_frames) == (12, 16, 1)
        assert (out["gif_anim"].width, out["gif_anim"].n_frames) == (12, 6)
        assert (out["avi_mjpeg"].width, out["avi_mjpeg"].n_frames) == (12, 6)
        assert out["wav_pcm"].n_frames >= 1 and out["wav_pcm"].width is None
        # progressive and baseline carry the same image -> nearby features
        import numpy as np
        fb = np.array(out["jpeg_base"].feature)
        fp = np.array(out["jpeg_prog"].feature)
        assert float(fb @ fp) > 0.999
        # a recognized-but-moov-less mp4 container quarantines (all NULL
        # — never an exception, never a faked feature)
        assert out["mp4_like"].feature is None
        assert out["mp4_like"].n_frames is None
        # truly unrecognizable bytes still fall back to the
        # deterministic unit-norm sha fake
        f = np.array(out["opaque"].feature)
        assert abs(float(f @ f) - 1.0) < 1e-9
