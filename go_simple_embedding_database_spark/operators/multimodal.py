"""Multimodal column operators — image/audio/video as opaque binary.

The Spark-side plumbing is REAL and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning for CPU-heavy decode. The codec
step is REAL for every format the dependency-free ``functions.codecs``
layer covers (binary PPM/PGM, 24/32-bit BMP, WAV incl. float and
24/32-bit PCM, PNG at every
legal bit depth incl. Adam7 interlace via stdlib zlib,
baseline sequential JPEG via an in-repo
T.81 Huffman+IDCT decoder — baseline AND progressive SOF2,
GIF87a/89a incl. animation via an in-repo
LZW decoder, baseline TIFF (uncompressed/LZW/PackBits),
Motion-JPEG AVI video: actual pixel/sample decode,
luma-grid / RMS-envelope features, nearest-neighbor resize,
real frame extraction). Formats whose SAMPLE DATA remains out of
stdlib+numpy reach (MP3, MP4 — MPEG audio granules, H.264/AAC access
units) route to quarantine-WITH-metadata: the container structure is
parsed for real (functions/codecs.parse_mp3/parse_mp4 — duration,
track dimensions, sample/frame counts, codec fourcc) and the feature
is NULL, never faked — downstream filters see them in the quarantine
set (``feature IS NULL``) while schedulers/planners still get true
durations and dimensions. Bytes that sniff as NO known container fall
back to a deterministic sha256 fake — so every downstream operator
(dedup by perceptual hash, ANN over media embeddings) stays
exercisable on arbitrary bytes. Swapping the fallback for a real
compressed-format decoder changes ONE function; the distributed plan
is already correct.

Design for 100 TB of media:
- payloads stay ``binary`` columns in Parquet — no driver materialization;
- decode/feature-extract runs in ``mapInPandas`` so one Arrow batch of
  payloads is decoded per Python call, with output column pruning via the
  caller-supplied schema;
- CPU-heavy stages repartition to cluster parallelism first (media tables
  are few-large-files shaped, the classic one-split trap).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id string, modality string, width int, height int, "
    "n_frames int, duration_sec double, codec string, "
    "feature array<double>"
)

# every branch of _decode_payload fills these; branches that cannot know
# a field leave it None rather than faking it
_DECODE_FIELDS = ("width", "height", "n_frames", "duration_sec", "codec",
                  "feature")


def _decode_payload(payload: bytes, modality: str) -> dict:
    """Decode one payload.

    REAL decode for the formats the dependency-free codec layer
    (functions/codecs.py) covers — binary PPM/PGM, uncompressed 24/32-bit
    BMP, TIFF (uncompressed/LZW/PackBits), PNG (all legal depths, incl. Adam7),
    baseline and progressive JPEG (pixel
    raster + 4x4 luma-grid feature), WAV at every common PCM/float
depth (sample stream +
    RMS-envelope feature), Motion-JPEG AVI and animated GIF (true frame
    count + first-frame feature). MP3/MP4 containers route to
    quarantine-WITH-metadata: real container parse (parse_mp3/parse_mp4
    — duration, track dims, sample counts, codec fourcc), feature NULL,
    never faked. Bytes sniffing as NO known container fall back to the
    deterministic sha256 fake so arbitrary bytes stay exercisable
    end-to-end; swapping the fallback for a real compressed-format
    decoder remains a one-function change.

    Raises ValueError on empty payloads and on recognized-but-corrupt
    payloads (truncated raster, compressed BMP, non-PCM WAV, malformed
    MP3/MP4 boxes) — the plain quarantine path (all fields NULL)."""
    from go_simple_embedding_database_spark.functions import codecs

    if payload is None or len(payload) == 0:
        raise ValueError("cannot decode empty payload")
    payload = bytes(payload)
    kind = codecs.sniff_format(payload)
    if kind == "avi":
        # Motion-JPEG video: REAL container parse + first-frame decode.
        # n_frames is the true movi chunk count (what frame_sample_plan
        # explodes over); the feature is the first frame's luma grid —
        # deterministic, and frame 0 is the thumbnail convention.
        w, h, frames = codecs.decode_avi_mjpeg(payload)
        first = codecs.decode_image(frames[0])
        # duration from the avih frame period × the TRUE movi frame count
        # (the header's dwTotalFrames lies more often than movi does)
        usec = codecs.avi_frame_period_usec(payload)
        return {
            "width": int(w),
            "height": int(h),
            "n_frames": len(frames),
            "duration_sec": len(frames) * usec / 1e6 if usec else None,
            "codec": "MJPG",
            "feature": codecs.image_feature(first, FEATURE_DIM),
        }
    if kind == "gif":
        # animated GIF: true frame count by the O(bytes) structure walk
        # (no LZW, no compositing), first-frame feature by a decode
        # bounded to ONE frame — a 10,000-frame animation costs one
        # frame of pixel work, not 10,000 (count/decode parity pinned
        # in tests/test_codecs_gif.py)
        n, duration = codecs.gif_scan(payload)
        w, h, frames = codecs.decode_gif(payload, max_frames=1)
        return {
            "width": int(w),
            "height": int(h),
            "n_frames": n,
            # sum of GCE delays from the same O(bytes) walk as the frame
            # count; None for static GIFs (no GCE delay present)
            "duration_sec": duration,
            "codec": None,
            "feature": codecs.image_feature(frames[0], FEATURE_DIM),
        }
    if kind in ("ppm", "pgm", "bmp", "png", "jpeg", "tiff"):
        rgb = codecs.decode_image(payload)
        return {
            "width": int(rgb.shape[1]),
            "height": int(rgb.shape[0]),
            "n_frames": 1,
            "duration_sec": None,
            "codec": None,
            "feature": codecs.image_feature(rgb, FEATURE_DIM),
        }
    if kind == "wav":
        rate, samples = codecs.decode_wav(payload)
        return {
            "width": None,
            "height": None,
            # frame ~= centisecond granule: sample count over rate/100
            "n_frames": int(max(1, samples.shape[0] * 100 // max(rate, 1))),
            "duration_sec": samples.shape[0] / rate if rate else None,
            "codec": None,
            "feature": codecs.audio_feature(samples, FEATURE_DIM),
        }
    if kind == "mp3":
        # quarantine-WITH-metadata: the MPEG audio frames themselves are
        # beyond a stdlib+numpy decode, but the container metadata is
        # parsed for REAL — feature stays NULL (the quarantine marker),
        # never faked
        meta = codecs.parse_mp3(payload)
        return {
            "width": None,
            "height": None,
            "n_frames": int(meta["n_frames"]),
            "duration_sec": float(meta["duration_sec"]),
            "codec": None,
            "feature": None,
        }
    if kind == "mp4":
        # quarantine-WITH-metadata, same contract as mp3: REAL box walk
        # (mvhd duration, tkhd dims, stsd codec fourcc, stsz sample
        # count) from the primary track — video if present, else first
        meta = codecs.parse_mp4(payload)
        track = next((t for t in meta["tracks"] if t["handler"] == "vide"),
                     meta["tracks"][0] if meta["tracks"] else None)
        t = track or {}
        return {
            "width": t.get("width"),
            "height": t.get("height"),
            "n_frames": t.get("n_samples"),
            "duration_sec": meta["duration_sec"],
            "codec": t.get("codec"),
            "feature": None,
        }
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240        # fake 16..255 px
    height = 16 + digest[1] % 240
    n_frames = 1 if modality == "image" else 1 + digest[2] % 64
    raw = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float64)
    raw = raw / 255.0 * 2.0 - 1.0
    norm = np.linalg.norm(raw)
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "duration_sec": None,
        "codec": None,
        "feature": (raw / norm if norm else raw).tolist(),
    }


def decode_media(df: DataFrame, on_error: str = "quarantine") -> DataFrame:
    """Decode + feature-extract every media row via mapInPandas (one Arrow
    batch per Python call). ``on_error='quarantine'`` turns decode failures
    into NULL-feature rows (filter ``feature IS NULL`` for the quarantine
    set — MP3/MP4 rows land there too, but with REAL container metadata:
    ``feature IS NULL AND n_frames IS NOT NULL`` selects the
    parsed-but-undecodable subset); ``'raise'`` propagates — a single
    corrupt file should not kill a 100 TB decode unless you ask it to."""
    from go_simple_embedding_database_spark.session import ensure_parallelism

    if on_error not in ("quarantine", "raise"):
        raise ValueError(f"on_error must be 'quarantine' or 'raise', got {on_error!r}")
    df = ensure_parallelism(df)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [],
                   **{f: [] for f in _DECODE_FIELDS}}
            for mid, modality, payload in zip(pdf["media_id"], pdf["modality"],
                                              pdf["payload"]):
                try:
                    d = _decode_payload(payload, modality)
                except Exception:
                    # Catch everything, not just ValueError: real codecs
                    # raise their own taxonomies (PIL OSError /
                    # UnidentifiedImageError, pyav AVError) and the
                    # quarantine contract must survive the promised
                    # one-function decoder swap.
                    if on_error == "raise":
                        raise
                    d = {f: None for f in _DECODE_FIELDS}
                out["media_id"].append(mid)
                out["modality"].append(modality)
                for f in _DECODE_FIELDS:
                    out[f].append(d[f])
            yield pd.DataFrame(out)

    return df.select("media_id", "modality", "payload").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata WITHOUT decoding: byte size + payload content hash.
    Pure Catalyst expressions — this is the operator you run on all 100 TB
    before deciding what to decode."""
    return df.select(
        "media_id",
        "modality",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into (media_id,
    frame_no) rows for frames 0, n, 2n, ... using the decoded n_frames —
    the shuffle-free explode that a real frame extractor would map over."""
    decoded = decode_media(df)
    # Only VIDEO rows have frames to sample — without the modality filter
    # every image (n_frames=1) and audio row would expand into fake frame
    # rows for the downstream extractor. n_frames must be > 0, not merely
    # non-NULL: a spec-legal MP4 with stsz sample_count=0 parses to
    # n_frames=0, and sequence(0, -1, every_nth) would kill the whole job
    # with IllegalArgumentException — one empty track must not end a
    # 100 TB scan.
    return (decoded
            .filter((F.col("modality") == "video") & (F.col("n_frames") > 0))
            .select(
                "media_id",
                F.explode(
                    F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
                ).alias("frame_no"),
            ))


FRAME_SCHEMA = ("media_id string, frame_no int, payload binary, "
                "width int, height int")


def extract_frames(df: DataFrame, every_nth: int = 10,
                   on_error: str = "quarantine") -> DataFrame:
    """REAL frame extraction for Motion-JPEG AVI and animated-GIF
    payloads: every Nth frame decoded and re-emitted as binary PPM (the
    codec's native output) — the executor stage ``frame_sample_plan``
    plans for.

    Scale shape: the AVI container walk finds frame OFFSETS without
    decoding, so skipped frames cost zero JPEG work (GIF's LZW stream
    is inherently sequential, so its skip saves only the PPM re-encode);
    one video row fans out to ceil(n_frames / every_nth) frame rows
    inside mapInPandas (no shuffle — the expansion happens within the
    partition that holds the payload). Unsupported / corrupt payloads
    quarantine as a single NULL-payload row per media_id
    (``on_error='raise'`` propagates), mirroring decode_media's
    contract."""
    from go_simple_embedding_database_spark.functions import codecs
    from go_simple_embedding_database_spark.session import ensure_parallelism

    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    if on_error not in ("quarantine", "raise"):
        raise ValueError(f"on_error must be 'quarantine' or 'raise', got {on_error!r}")
    df = ensure_parallelism(df)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "payload": [],
                   "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None or len(payload) == 0:
                        raise ValueError("empty payload")
                    raw = bytes(payload)
                    if codecs.sniff_format(raw) == "gif":
                        _, _, comps = codecs.decode_gif(raw)
                        sampled = [(fno, comps[fno])
                                   for fno in range(0, len(comps), every_nth)]
                    else:
                        _, _, jpegs = codecs.decode_avi_mjpeg(raw)
                        sampled = [(fno, codecs.decode_image(jpegs[fno]))
                                   for fno in range(0, len(jpegs), every_nth)]
                    for fno, rgb in sampled:
                        out["media_id"].append(mid)
                        out["frame_no"].append(fno)
                        out["payload"].append(codecs.encode_ppm(rgb))
                        out["width"].append(int(rgb.shape[1]))
                        out["height"].append(int(rgb.shape[0]))
                except Exception:
                    if on_error == "raise":
                        raise
                    out["media_id"].append(mid)
                    out["frame_no"].append(None)
                    out["payload"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        _extract, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Test/bench adapter: wrap the documents table's text bytes as fake
    media payloads (schema.MEDIA_SCHEMA shape) — the container has no real
    media files; the bytes are opaque to every operator above anyway."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


RESIZED_SCHEMA = ("media_id string, modality string, payload binary, "
                  "width int, height int")


def _resize_payload(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Resize one image payload.

    REAL pixel work for every still-image format the codec layer
    decodes (PPM/PGM/BMP/PNG/JPEG/GIF first frame): nearest-neighbor
    resample of the decoded raster, re-encoded as binary PPM (the
    codec's native output). Unrecognized formats fall back to a
    deterministic fake whose size scales with the target area (byte
    budgets and partition sizing stay realistic) — the
    compressed-format slot for a future PIL/ffmpeg swap. Raises on empty
    input like the decoder."""
    from go_simple_embedding_database_spark.functions import codecs

    if payload is None or len(payload) == 0:
        raise ValueError("cannot resize empty payload")
    payload = bytes(payload)
    if codecs.sniff_format(payload) in ("ppm", "pgm", "bmp", "png",
                                        "jpeg", "gif", "tiff"):
        rgb = codecs.decode_image(payload)
        return codecs.encode_ppm(
            codecs.resize_nearest(rgb, target_w, target_h))
    seed = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
    reps = max(1, (target_w * target_h) // (8 * len(seed)))
    return (seed * reps)[: max(len(seed), target_w * target_h // 8)]


def resize_media(df: DataFrame, target_w: int, target_h: int,
                 on_error: str = "quarantine") -> DataFrame:
    """Resize every image/video payload to (target_w, target_h) via
    mapInPandas — the normalization pass a multimodal training pipeline
    runs before packing tensors. Plumbing is real (Arrow batches,
    repartition-before-CPU-heavy-stage, quarantine on failure — NULL
    payload rows are the quarantine set). Pixel work is REAL for the
    codec layer's formats (PPM/PGM/BMP: nearest-neighbor resample,
    re-encoded as binary PPM — recognized-but-corrupt payloads
    quarantine); unrecognized (compressed) formats get a deterministic
    size-scaled fake from the one clearly-marked fallback in
    ``_resize_payload``, swappable for PIL/ffmpeg without touching the
    Spark side. NON-EMPTY audio rows pass through unchanged (resizing
    is meaningless for them) with their original payload and NULL dims;
    empty/NULL payloads quarantine for every modality, same contract as
    decode_media.
    """
    from go_simple_embedding_database_spark.session import ensure_parallelism

    if on_error not in ("quarantine", "raise"):
        raise ValueError(f"on_error must be 'quarantine' or 'raise', got {on_error!r}")
    if target_w < 1 or target_h < 1:
        raise ValueError("target dimensions must be positive")
    df = ensure_parallelism(df)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "payload": [],
                   "width": [], "height": []}
            for mid, modality, payload in zip(pdf["media_id"], pdf["modality"],
                                              pdf["payload"]):
                try:
                    if payload is None or len(payload) == 0:
                        # Same failure contract for EVERY modality
                        # (decode_media's rule): an empty payload is
                        # broken input, and audio passthrough must not
                        # smuggle it past the quarantine filter.
                        raise ValueError("cannot resize empty payload")
                    if modality == "audio":
                        p, w, h = payload, None, None
                    else:
                        p = _resize_payload(payload, target_w, target_h)
                        w, h = target_w, target_h
                except Exception:
                    if on_error == "raise":
                        raise
                    p, w, h = None, None, None
                out["media_id"].append(mid)
                out["modality"].append(modality)
                out["payload"].append(p)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select("media_id", "modality", "payload").mapInPandas(
        _resize, schema=RESIZED_SCHEMA)
