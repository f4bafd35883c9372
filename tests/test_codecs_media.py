"""MP3 / MP4 container parsing + the quarantine-with-metadata routing.

The sample data inside these containers (MPEG audio granules, H.264/AAC
access units) is beyond a stdlib+numpy decode, so the contract under
test is: parse_mp3/parse_mp4 extract REAL container metadata (duration,
track dims, sample counts, codec fourcc) from hand-built spec-valid
fixtures (ISO 11172-3 framing, ISO-BMFF box grammar — no binary files,
no PIL/ffmpeg), malformed containers raise ValueError (never
IndexError/struct.error — the ``except ValueError`` quarantine callers
depend on it), and operators/multimodal routes both formats to
feature-NULL rows that keep the parsed metadata."""

import struct

import pytest

from go_simple_embedding_database_spark.functions import codecs


# --------------------------------------------------------------------------
# fixture builders
# --------------------------------------------------------------------------

def mp3_frame(br_idx: int = 9, sr_idx: int = 0, pad: int = 0,
              mono: bool = False) -> bytes:
    """One spec-valid MPEG1 Layer III frame, zero-filled payload.
    br_idx=9 -> 128 kbps, sr_idx=0 -> 44100 Hz."""
    b2 = 0xFB                                   # MPEG1, Layer III, no CRC
    b3 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b4 = 0xC0 if mono else 0x00
    hdr = bytes([0xFF, b2, b3, b4])
    info = codecs._mp3_frame_header(hdr, 0)
    assert info is not None, "fixture built an invalid frame header"
    return hdr + b"\x00" * (info[0] - 4)


def id3v2(body_len: int = 20, footer: bool = False,
          version: int = 4) -> bytes:
    """ID3v2 tag: header + zero body (+ the 10-byte footer when flagged —
    NOT counted in the syncsafe size, per ID3v2.4.0 §3.1)."""
    flags = 0x10 if footer else 0x00
    tag = b"ID3" + bytes([version, 0, flags, 0, 0, 0, body_len])
    tag += b"\x00" * body_len
    if footer:
        tag += b"3DI" + bytes([version, 0, flags, 0, 0, 0, body_len])
    return tag


def box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def trak(handler: bytes = b"vide", codec: bytes = b"avc1",
         width: int = 640, height: int = 360, n_samples: int = 150) -> bytes:
    tkhd = box(b"tkhd", b"\x00" * 76 +
               struct.pack(">I", width << 16) + struct.pack(">I", height << 16))
    hdlr = box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12)
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) +
               struct.pack(">I", 16) + codec + b"\x00" * 8)
    stsz = box(b"stsz", b"\x00" * 8 + struct.pack(">I", n_samples))
    stbl = box(b"stbl", stsd + stsz)
    mdia = box(b"mdia", hdlr + box(b"minf", stbl))
    return box(b"trak", tkhd + mdia)


def mp4_fixture(*traks: bytes, timescale: int = 1000, duration: int = 5000,
                largesize_moov: bool = False) -> bytes:
    mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8 +
               struct.pack(">I", timescale) + struct.pack(">I", duration) +
               b"\x00" * 80)
    inner = mvhd + (b"".join(traks) if traks else trak())
    if largesize_moov:
        moov = (struct.pack(">I", 1) + b"moov" +
                struct.pack(">Q", 16 + len(inner)) + inner)
    else:
        moov = box(b"moov", inner)
    return box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomiso2") + moov


FTYP = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomiso2")


# --------------------------------------------------------------------------
# parse_mp3
# --------------------------------------------------------------------------

class TestParseMp3:
    def test_cbr_stream(self):
        m = codecs.parse_mp3(mp3_frame() * 3)
        assert m == {"sample_rate": 44100, "channels": 2, "n_frames": 3,
                     "duration_sec": 3 * 1152 / 44100, "bitrate_kbps": 128.0}

    def test_vbr_mean_bitrate(self):
        # 128 + 192 kbps frames (br_idx 9 and 11 in the MPEG1-L3 table)
        m = codecs.parse_mp3(mp3_frame(br_idx=9) + mp3_frame(br_idx=11))
        assert m["n_frames"] == 2
        assert m["bitrate_kbps"] == pytest.approx((128 + 192) / 2)

    def test_id3v2_prefix_skipped(self):
        m = codecs.parse_mp3(id3v2(body_len=33) + mp3_frame() * 2)
        assert m["n_frames"] == 2

    def test_id3v2_footer_flag(self):
        """ID3v2.4 footer is NOT included in the syncsafe size — a scan
        that ignores the flag starts inside the footer bytes and
        spuriously quarantines a valid file (ADVICE r04 regression)."""
        m = codecs.parse_mp3(id3v2(footer=True) + mp3_frame() * 2)
        assert m["n_frames"] == 2

    def test_padding_bit_sizes_frame(self):
        m = codecs.parse_mp3(mp3_frame(pad=1) + mp3_frame(pad=0))
        assert m["n_frames"] == 2

    def test_mono_channels(self):
        assert codecs.parse_mp3(mp3_frame(mono=True))["channels"] == 1

    def test_trailing_junk_ends_scan(self):
        m = codecs.parse_mp3(mp3_frame() + b"TAG" + b"\x00" * 125)
        assert m["n_frames"] == 1

    def test_no_frames_raises(self):
        with pytest.raises(ValueError):
            codecs.parse_mp3(id3v2() + b"not audio at all")

    def test_malformed_syncsafe_raises(self):
        with pytest.raises(ValueError):
            codecs.parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\xFF" + b"\x00" * 8)

    def test_sniff(self):
        assert codecs.sniff_format(id3v2() + mp3_frame()) == "mp3"
        assert codecs.sniff_format(mp3_frame() * 2) == "mp3"


# --------------------------------------------------------------------------
# parse_mp4
# --------------------------------------------------------------------------

class TestParseMp4:
    def test_video_track(self):
        m = codecs.parse_mp4(mp4_fixture())
        assert m["brand"] == "isom"
        assert m["duration_sec"] == 5.0
        assert m["tracks"] == [{"handler": "vide", "codec": "avc1",
                                "width": 640, "height": 360,
                                "n_samples": 150}]

    def test_audio_track(self):
        m = codecs.parse_mp4(mp4_fixture(
            trak(handler=b"soun", codec=b"mp4a", width=0, height=0,
                 n_samples=861)))
        t = m["tracks"][0]
        assert (t["handler"], t["codec"], t["n_samples"]) == \
            ("soun", "mp4a", 861)
        assert t["width"] is None and t["height"] is None

    def test_largesize_64bit_moov(self):
        """size==1 + 64-bit largesize box header (ISO-BMFF §4.2)."""
        assert codecs.parse_mp4(mp4_fixture(largesize_moov=True)) == \
            codecs.parse_mp4(mp4_fixture())

    def test_mvhd_v1_64bit_duration(self):
        mvhd = box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16 +
                   struct.pack(">I", 600) + struct.pack(">Q", 1800) +
                   b"\x00" * 80)
        m = codecs.parse_mp4(FTYP + box(b"moov", mvhd))
        assert m["duration_sec"] == 3.0

    def test_fragmented_no_moov_raises(self):
        with pytest.raises(ValueError, match="no moov"):
            codecs.parse_mp4(FTYP + box(b"moof", b"\x00" * 8))

    def test_empty_mvhd_raises_valueerror_not_indexerror(self):
        """ADVICE r04 regression: an empty mvhd body indexed past the
        payload end with IndexError, escaping ``except ValueError``
        quarantine callers."""
        with pytest.raises(ValueError):
            codecs.parse_mp4(FTYP + box(b"moov", box(b"mvhd", b"")))

    def test_truncated_mvhd_raises_valueerror_not_struct_error(self):
        with pytest.raises(ValueError):
            codecs.parse_mp4(
                FTYP + box(b"moov", box(b"mvhd", b"\x00\x00\x00\x00\xAA")))

    def test_truncated_tkhd_stsz_raise_valueerror(self):
        mvhd = box(b"mvhd", b"\x00" * 20 + b"\x00" * 80)
        for broken in (box(b"tkhd", b"\x00" * 4),
                       box(b"mdia", box(b"minf", box(
                           b"stbl", box(b"stsz", b"\x00" * 9))))):
            with pytest.raises(ValueError):
                codecs.parse_mp4(
                    FTYP + box(b"moov", mvhd + box(b"trak", broken)))

    def test_box_overrun_raises(self):
        bad = FTYP + struct.pack(">I", 10 ** 6) + b"moov"
        with pytest.raises(ValueError):
            codecs.parse_mp4(bad)

    def test_not_bmff_raises(self):
        with pytest.raises(ValueError):
            codecs.parse_mp4(b"just sixteen chars")

    def test_sniff(self):
        assert codecs.sniff_format(mp4_fixture()) == "mp4"
        # ASCII text can never satisfy the sane-first-box-size guard
        assert codecs.sniff_format(b"text ftypmore text here") is None


# --------------------------------------------------------------------------
# multimodal routing: quarantine WITH metadata
# --------------------------------------------------------------------------

class TestMultimodalRouting:
    def test_decode_payload_mp3_metadata_real_feature_null(self):
        from go_simple_embedding_database_spark.operators.multimodal import \
            _decode_payload
        d = _decode_payload(id3v2(footer=True) + mp3_frame() * 4, "audio")
        assert d["feature"] is None                 # quarantine marker
        assert d["n_frames"] == 4                   # real container metadata
        assert d["duration_sec"] == pytest.approx(4 * 1152 / 44100)
        assert d["width"] is None and d["height"] is None

    def test_decode_payload_mp4_metadata_real_feature_null(self):
        from go_simple_embedding_database_spark.operators.multimodal import \
            _decode_payload
        d = _decode_payload(mp4_fixture(), "video")
        assert d["feature"] is None
        assert (d["width"], d["height"]) == (640, 360)
        assert d["n_frames"] == 150                 # stsz sample count
        assert d["duration_sec"] == 5.0
        assert d["codec"] == "avc1"

    def test_decode_payload_mp4_prefers_video_track(self):
        from go_simple_embedding_database_spark.operators.multimodal import \
            _decode_payload
        # audio trak FIRST, video trak second — the video one must win
        payload = mp4_fixture(
            trak(handler=b"soun", codec=b"mp4a", width=0, height=0,
                 n_samples=861),
            trak(handler=b"vide", codec=b"hvc1", width=320, height=240,
                 n_samples=77))
        d = _decode_payload(payload, "video")
        assert (d["codec"], d["width"], d["height"], d["n_frames"]) == \
            ("hvc1", 320, 240, 77)

    def test_decode_payload_mp4_audio_only_uses_first_track(self):
        from go_simple_embedding_database_spark.operators.multimodal import \
            _decode_payload
        d = _decode_payload(mp4_fixture(
            trak(handler=b"soun", codec=b"mp4a", width=0, height=0,
                 n_samples=861)), "audio")
        assert (d["codec"], d["n_frames"]) == ("mp4a", 861)
        assert d["feature"] is None

    def test_decode_media_mixed_batch(self, spark):
        """One decode_media pass over mp3 + mp4 + malformed-mp4 + junk:
        parseable containers keep metadata with NULL features, malformed
        ones take the all-NULL quarantine, junk takes the sha fake."""
        from go_simple_embedding_database_spark.operators.multimodal import \
            decode_media
        bad_mp4 = FTYP + box(b"moov", box(b"mvhd", b""))
        rows = [("mp3", "audio", bytearray(id3v2() + mp3_frame() * 5)),
                ("mp4", "video", bytearray(mp4_fixture())),
                ("bad", "video", bytearray(bad_mp4)),
                ("junk", "image", bytearray(b"no container here at all"))]
        df = spark.createDataFrame(
            rows, "media_id string, modality string, payload binary")
        out = {r.media_id: r for r in decode_media(df).collect()}
        assert out["mp3"].feature is None
        assert out["mp3"].n_frames == 5
        assert out["mp3"].duration_sec == pytest.approx(5 * 1152 / 44100)
        assert out["mp4"].feature is None
        assert (out["mp4"].width, out["mp4"].height,
                out["mp4"].n_frames, out["mp4"].codec) == (640, 360, 150,
                                                           "avc1")
        assert out["bad"].feature is None and out["bad"].n_frames is None
        assert out["junk"].feature is not None      # sha fallback unchanged
        # quarantine-with-metadata is selectable: feature NULL but parsed
        parsed = {r.media_id for r in decode_media(df)
                  .filter("feature IS NULL AND n_frames IS NOT NULL")
                  .collect()}
        assert parsed == {"mp3", "mp4"}

    def test_decode_media_raise_propagates_malformed_mp4(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import \
            decode_media
        bad = FTYP + box(b"moov", box(b"mvhd", b"\x00\x00"))
        df = spark.createDataFrame(
            [("x", "video", bytearray(bad))],
            "media_id string, modality string, payload binary")
        with pytest.raises(Exception):
            decode_media(df, on_error="raise").collect()


class TestEdgeCases:
    def test_mp3_mpeg2_layer3_576_samples(self):
        """MPEG2 Layer III frames carry 576 samples (ISO 13818-3), not
        1152 — duration math must use the per-version count."""
        # version bits 10 (MPEG2), layer III, no CRC -> b2 = 0xF3
        # br_idx 6 -> 48 kbps in the MPEG2-L3 table; sr_idx 0 -> 22050 Hz
        b2, b3 = 0xF3, (6 << 4) | (0 << 2) | 0
        hdr = bytes([0xFF, b2, b3, 0x00])
        info = codecs._mp3_frame_header(hdr, 0)
        assert info is not None
        flen, samples, rate, _, kbps = info
        assert (samples, rate, kbps) == (576, 22050, 48)
        m = codecs.parse_mp3((hdr + b"\x00" * (flen - 4)) * 2)
        assert m["n_frames"] == 2
        assert m["duration_sec"] == pytest.approx(2 * 576 / 22050)

    def test_mp4_size_zero_box_extends_to_eof(self):
        """A box with size==0 runs to end-of-file (ISO-BMFF §4.2) — legal
        for the last top-level box."""
        full = mp4_fixture()
        moov_at = full.find(b"moov") - 4
        patched = bytearray(full)
        import struct as _s
        _s.pack_into(">I", patched, moov_at, 0)
        assert codecs.parse_mp4(bytes(patched)) == codecs.parse_mp4(full)

    def test_resize_media_audio_mp3_passes_through(self, spark):
        """resize_media's audio contract is format-agnostic: a non-empty
        mp3 payload passes through unchanged with NULL dims."""
        from go_simple_embedding_database_spark.operators.multimodal import (
            resize_media)
        payload = id3v2() + mp3_frame() * 2
        df = spark.createDataFrame(
            [("a", "audio", bytearray(payload))],
            "media_id string, modality string, payload binary")
        r = resize_media(df, 8, 8).collect()[0]
        assert bytes(r.payload) == payload
        assert r.width is None and r.height is None

    def test_frame_sample_plan_covers_mp4_metadata(self, spark):
        """frame_sample_plan explodes over decode_media's n_frames; an
        mp4 video row (quarantine-with-metadata, REAL stsz count) now
        yields a real sampling plan even though pixels are undecodable."""
        from go_simple_embedding_database_spark.operators.multimodal import (
            frame_sample_plan)
        df = spark.createDataFrame(
            [("v", "video", bytearray(mp4_fixture()))],
            "media_id string, modality string, payload binary")
        rows = sorted(r.frame_no for r in
                      frame_sample_plan(df, every_nth=50).collect())
        assert rows == [0, 50, 100]                # stsz n_samples = 150

    def test_frame_sample_plan_skips_zero_sample_track(self, spark):
        """A spec-legal MP4 whose stsz declares sample_count=0 parses to
        n_frames=0; frame_sample_plan must DROP that row (nothing to
        sample) rather than evaluate sequence(0, -1, n) and kill the
        whole job with IllegalArgumentException (ADVICE r05 medium)."""
        from go_simple_embedding_database_spark.operators.multimodal import (
            frame_sample_plan)
        df = spark.createDataFrame(
            [("empty", "video", bytearray(mp4_fixture(trak(n_samples=0)))),
             ("ok", "video", bytearray(mp4_fixture()))],
            "media_id string, modality string, payload binary")
        rows = frame_sample_plan(df, every_nth=50).collect()
        assert sorted({r.media_id for r in rows}) == ["ok"]
        assert sorted(r.frame_no for r in rows) == [0, 50, 100]


class TestQuarantineContractFuzz:
    """The quarantine contract, fuzzed: whatever bytes arrive, the
    parsers either return metadata or raise ValueError — never
    IndexError/struct.error/KeyError (which would escape the
    ``except ValueError`` quarantine path ADVICE r04 exercised by hand)
    and never hang. Seeds cover the adversarial shapes found so far:
    truncated boxes, lying sizes, bodies shorter than their fields."""

    def _assert_value_error_only(self, fn, payload):
        try:
            fn(payload)
        except ValueError:
            pass

    def test_parse_mp4_fuzz(self):
        import numpy as np
        rng = np.random.default_rng(97)
        good = mp4_fixture()
        for trial in range(400):
            p = bytearray(good)
            mode = trial % 4
            if mode == 0:                       # truncate anywhere
                p = p[: int(rng.integers(0, len(p) + 1))]
            elif mode == 1:                     # flip random bytes
                for _ in range(int(rng.integers(1, 6))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            elif mode == 2:                     # random tail after ftyp
                n = int(rng.integers(0, 80))
                p = bytearray(FTYP) + bytes(rng.integers(0, 256, n,
                                                         dtype=np.uint8))
            else:                               # lying box sizes
                off = int(rng.integers(0, max(1, len(p) - 4)))
                p[off:off + 4] = int(rng.integers(0, 2**32,
                                                  dtype=np.uint64)).to_bytes(
                    4, "big")
            self._assert_value_error_only(codecs.parse_mp4, bytes(p))

    def test_parse_mp3_fuzz(self):
        import numpy as np
        rng = np.random.default_rng(41)
        good = id3v2(footer=True) + mp3_frame() * 3
        for trial in range(400):
            p = bytearray(good)
            mode = trial % 3
            if mode == 0:
                p = p[: int(rng.integers(0, len(p) + 1))]
            elif mode == 1:
                for _ in range(int(rng.integers(1, 6))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            else:                               # raw junk, 0xFF-seeded
                n = int(rng.integers(4, 120))
                p = bytearray(b"\xff") + bytes(rng.integers(0, 256, n,
                                                            dtype=np.uint8))
            self._assert_value_error_only(codecs.parse_mp3, bytes(p))

    def test_gif_frame_count_fuzz(self):
        import numpy as np
        rng = np.random.default_rng(7)
        img = np.zeros((6, 6, 3), dtype=np.uint8)
        good = codecs.encode_gif([img, img + 64])
        for trial in range(300):
            p = bytearray(good)
            if trial % 2 == 0:
                p = p[: int(rng.integers(13, len(p) + 1))]
            else:
                for _ in range(int(rng.integers(1, 5))):
                    p[int(rng.integers(13, len(p)))] = int(rng.integers(0, 256))
            self._assert_value_error_only(codecs.gif_frame_count, bytes(p))

    def test_decode_payload_fuzz_never_escapes_quarantine(self):
        """End-to-end: the decode entry point itself (what mapInPandas
        wraps) raises nothing but ValueError-compatible exceptions for
        arbitrary mutated media bytes — the quarantine catch is
        ``except Exception`` so anything non-crashing passes, but a hang
        or a MemoryError here would kill a 100 TB decode."""
        import numpy as np

        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        rng = np.random.default_rng(3)
        seeds = [mp4_fixture(), id3v2() + mp3_frame() * 2,
                 codecs.encode_gif([np.zeros((4, 4, 3), dtype=np.uint8)])]
        for trial in range(300):
            p = bytearray(seeds[trial % len(seeds)])
            p = p[: int(rng.integers(1, len(p) + 1))]
            for _ in range(int(rng.integers(0, 4))):
                p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            try:
                _decode_payload(bytes(p), "video")
            except Exception:
                pass                             # quarantine-compatible
