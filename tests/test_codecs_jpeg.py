"""Baseline JPEG codec tests — decoder correctness without binary
fixtures.

Strategy: the in-repo encoder (functions/codecs.encode_jpeg) emits
spec-valid baseline streams, so every decoder stage is exercised
end-to-end (marker walk, DHT canonical codes, Huffman entropy decode,
restart markers, dequantize, de-zigzag, IDCT, 4:2:0 upsampling,
YCbCr->RGB). Round-trip tests alone could hide a SHARED misconception
(e.g. both sides agreeing on a wrong zigzag), so the building blocks are
additionally pinned against published known answers: the T.81 zigzag
sequence prefix, the canonical-code assignment of the standard Annex K
DC-luminance Huffman table, DCT orthogonality, and an analytic DC-only
reconstruction."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_simple_embedding_database_spark.functions import codecs
from go_simple_embedding_database_spark.functions.codecs import (
    _JPEG_DCT_A,
    _JPEG_ZIGZAG,
    _JpegBitReader,
    _JpegBitWriter,
    _JpegHuffTable,
)


def _smooth_image(h: int, w: int) -> np.ndarray:
    """Deterministic low-frequency RGB test image (kind to quantization)."""
    y = np.linspace(0.0, 3.0, h)
    x = np.linspace(0.0, 2.0, w)
    base = np.outer(np.cos(y), np.sin(x)) * 60.0 + 120.0
    return np.stack([base, base * 0.9 + 10.0, base * 0.8 + 20.0],
                    axis=2).astype(np.uint8)


class TestBuildingBlocks:
    def test_zigzag_known_prefix_and_permutation(self):
        # First 10 entries of the published T.81 zigzag sequence.
        assert list(_JPEG_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert _JPEG_ZIGZAG[63] == 63
        assert sorted(_JPEG_ZIGZAG.tolist()) == list(range(64))

    def test_dct_matrix_orthonormal(self):
        err = np.abs(_JPEG_DCT_A @ _JPEG_DCT_A.T - np.eye(8)).max()
        assert err < 1e-12

    def test_canonical_codes_match_standard_dc_luminance_table(self):
        # Standard Annex K DC luminance table: categories 0..11 at code
        # lengths [2,3,3,3,3,3,4,5,6,7,8,9]. Canonical assignment gives
        # the published codes 00, 010, 011, ..., 111111110.
        bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        tbl = _JpegHuffTable(bits, list(range(12)))
        assert tbl.encode[0] == (2, 0b00)
        assert tbl.encode[1] == (3, 0b010)
        assert tbl.encode[5] == (3, 0b110)
        assert tbl.encode[6] == (4, 0b1110)
        assert tbl.encode[11] == (9, 0b111111110)

    def test_oversubscribed_table_rejected(self):
        with pytest.raises(ValueError, match="over-subscribed"):
            _JpegHuffTable([3] + [0] * 15, [0, 1, 2])  # 3 codes of length 1

    @given(st.lists(st.integers(min_value=0, max_value=161),
                    min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_huffman_bits_round_trip(self, symbols):
        """Write symbols + pad with the encoder table, read them back with
        the same table through the bit reader — the canonical code maps
        must be mutually consistent at every length."""
        tbl = _JpegHuffTable(codecs._JPEG_ENC_AC_BITS, codecs._JPEG_ENC_AC_VALS)
        sym_vals = [codecs._JPEG_ENC_AC_VALS[s] for s in symbols]
        w = _JpegBitWriter()
        for v in sym_vals:
            length, code = tbl.encode[v]
            w.write(code, length)
        w.byte_align()
        r = _JpegBitReader(bytes(w.out))
        assert [r.huff_decode(tbl) for _ in sym_vals] == sym_vals

    def test_bit_writer_stuffs_ff(self):
        w = _JpegBitWriter()
        w.write(0xFF, 8)
        assert bytes(w.out) == b"\xff\x00"


class TestRoundTrip:
    def test_flat_color_is_exact(self):
        # A uniform image has only DC energy; quantization of a single DC
        # coefficient reconstructs the exact level at high quality.
        img = np.full((32, 32, 3), 128, dtype=np.uint8)
        dec = codecs.decode_image(codecs.encode_jpeg(img, quality=90))
        assert (dec == img).all()

    def test_analytic_dc_only_gray_level(self):
        # Uniform gray v: DC coefficient = 8*(v-128); with the q=50 luma
        # table (DC step 16) the quantized DC is round(8*(v-128)/16) and
        # the reconstruction is exactly 128 + 2*round((v-128)/2).
        v = 77
        img = np.full((16, 16), v, dtype=np.uint8)
        dec = codecs.decode_image(codecs.encode_jpeg(img, quality=50))
        expected = 128 + 2 * round((v - 128) / 2)
        assert (dec == expected).all()

    def test_smooth_gradient_close(self):
        img = _smooth_image(40, 48)
        dec = codecs.decode_image(codecs.encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 2.0

    def test_420_subsampling_odd_dimensions(self):
        img = _smooth_image(37, 45)
        dec = codecs.decode_image(
            codecs.encode_jpeg(img, quality=85, subsample="420"))
        assert dec.shape == (37, 45, 3)
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 3.0

    def test_grayscale_single_component(self):
        g = np.tile((np.arange(40, dtype=np.uint8) * 5), (24, 1))
        dec = codecs.decode_image(codecs.encode_jpeg(g, quality=92))
        assert dec.shape == (24, 40, 3)
        # gray JPEG decodes with identical channels
        assert (dec[:, :, 0] == dec[:, :, 1]).all()
        assert (dec[:, :, 0] == dec[:, :, 2]).all()
        assert np.abs(dec[:, :, 0].astype(float) - g.astype(float)).mean() < 2.0

    def test_restart_markers_decode_identically(self):
        # Same quantized coefficients, different entropy segmentation —
        # the decoded pixels must be bit-identical, which pins the
        # restart path (DC predictor reset, byte realignment, RSTn walk).
        img = _smooth_image(40, 48)
        plain = codecs.decode_image(codecs.encode_jpeg(img, quality=85))
        rst = codecs.decode_image(
            codecs.encode_jpeg(img, quality=85, restart_interval=2))
        assert (plain == rst).all()
        assert b"\xff\xdd" in codecs.encode_jpeg(
            img, quality=85, restart_interval=2)  # DRI actually emitted

    def test_noise_survives_high_quality(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = codecs.decode_image(codecs.encode_jpeg(img, quality=95))
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 8.0

    @given(st.integers(min_value=1, max_value=40),
           st.integers(min_value=1, max_value=40),
           st.integers(min_value=0, max_value=255))
    @settings(max_examples=25, deadline=None)
    def test_flat_any_shape_round_trips_tightly(self, h, w, v):
        """Arbitrary (non-8-multiple) shapes: padding + crop must
        preserve dimensions, and flat color must stay within the DC
        quantization step."""
        img = np.full((h, w, 3), v, dtype=np.uint8)
        dec = codecs.decode_image(codecs.encode_jpeg(img, quality=95))
        assert dec.shape == (h, w, 3)
        assert np.abs(dec.astype(int) - int(v)).max() <= 4


class TestRejection:
    def test_sniff(self):
        img = np.full((8, 8, 3), 9, dtype=np.uint8)
        assert codecs.sniff_format(codecs.encode_jpeg(img)) == "jpeg"
        assert codecs.sniff_format(b"\xff\xd8fake jpeg text") is None
        assert codecs.sniff_format(b"\xff\xd8\xff") is None  # < 12 bytes

    def test_truncated_entropy_stream(self):
        enc = codecs.encode_jpeg(_smooth_image(24, 24), quality=85)
        with pytest.raises(ValueError, match="truncated|missing"):
            codecs.decode_image(enc[: len(enc) // 2])

    def test_progressive_rejected(self):
        enc = bytearray(codecs.encode_jpeg(_smooth_image(16, 16)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="progressive"):
            codecs.decode_image(bytes(enc))

    def test_missing_sos_rejected(self):
        enc = codecs.encode_jpeg(_smooth_image(16, 16))
        sos = enc.find(b"\xff\xda")
        with pytest.raises(ValueError, match="missing SOF/SOS"):
            codecs.decode_image(enc[:sos] + b"\xff\xd9")

    def test_encoder_validation(self):
        with pytest.raises(ValueError, match="quality"):
            codecs.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=0)
        with pytest.raises(ValueError, match="subsample"):
            codecs.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8),
                               subsample="422")
        with pytest.raises(ValueError, match="empty"):
            codecs.encode_jpeg(np.zeros((0, 8, 3), dtype=np.uint8))
        with pytest.raises(ValueError, match="shape"):
            codecs.encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))


class TestOperatorIntegration:
    def test_decode_payload_uses_real_jpeg_codec(self):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        img = _smooth_image(20, 30)
        out = _decode_payload(codecs.encode_jpeg(img, quality=90), "image")
        # REAL dimensions (the sha256 fake would give digest-derived ones)
        assert (out["width"], out["height"], out["n_frames"]) == (30, 20, 1)
        feat = np.array(out["feature"])
        assert feat.shape == (16,)
        assert abs(np.linalg.norm(feat) - 1.0) < 1e-9

    def test_decode_payload_feature_matches_decoded_pixels(self):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        img = _smooth_image(24, 24)
        payload = codecs.encode_jpeg(img, quality=90)
        out = _decode_payload(payload, "image")
        direct = codecs.image_feature(codecs.decode_image(payload), 16)
        assert out["feature"] == direct

    def test_resize_payload_decodes_jpeg_to_ppm(self):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _resize_payload)
        img = _smooth_image(32, 32)
        out = _resize_payload(codecs.encode_jpeg(img, quality=90), 8, 8)
        assert codecs.sniff_format(out) == "ppm"
        rgb = codecs.decode_image(out)
        assert rgb.shape == (8, 8, 3)


def _frames(n: int, h: int = 24, w: int = 32) -> list:
    return [_smooth_image(h, w) + np.uint8(t) for t in range(n)]


class TestAviMjpeg:
    def test_sniff_and_round_trip(self):
        avi = codecs.encode_avi_mjpeg(_frames(7), fps=5, quality=90)
        assert codecs.sniff_format(avi) == "avi"
        w, h, jpegs = codecs.decode_avi_mjpeg(avi)
        assert (w, h, len(jpegs)) == (32, 24, 7)
        for jpeg, orig in zip(jpegs, _frames(7)):
            dec = codecs.decode_image(jpeg)
            assert dec.shape == (24, 32, 3)
            assert np.abs(dec.astype(float) - orig.astype(float)).mean() < 2.0

    def test_foreign_codec_rejected(self):
        avi = bytearray(codecs.encode_avi_mjpeg(_frames(2)))
        i = avi.find(b"MJPG", avi.find(b"strf"))
        avi[i : i + 4] = b"H264"
        with pytest.raises(ValueError, match="MJPG only"):
            codecs.decode_avi_mjpeg(bytes(avi))

    def test_truncated_rejected(self):
        avi = codecs.encode_avi_mjpeg(_frames(3))
        with pytest.raises(ValueError):
            codecs.decode_avi_mjpeg(avi[: len(avi) // 2])

    def test_encoder_validation(self):
        with pytest.raises(ValueError, match="empty"):
            codecs.encode_avi_mjpeg([])
        with pytest.raises(ValueError, match="one size"):
            codecs.encode_avi_mjpeg([np.zeros((8, 8, 3), dtype=np.uint8),
                                     np.zeros((16, 8, 3), dtype=np.uint8)])

    def test_frame_period_header_only(self):
        avi = codecs.encode_avi_mjpeg(_frames(3), fps=25)
        assert codecs.avi_frame_period_usec(avi) == 40_000     # 1e6/25
        # zeroed period (unset muxer field) -> None, not duration 0
        z = bytearray(avi)
        i = z.find(b"avih") + 8
        z[i : i + 4] = b"\x00\x00\x00\x00"
        assert codecs.avi_frame_period_usec(bytes(z)) is None
        with pytest.raises(ValueError):
            codecs.avi_frame_period_usec(b"not an avi")

    def test_decode_payload_video_is_real(self):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        avi = codecs.encode_avi_mjpeg(_frames(12), fps=10, quality=90)
        out = _decode_payload(avi, "video")
        assert (out["width"], out["height"], out["n_frames"]) == (32, 24, 12)
        # duration = true movi frame count x avih frame period (r05 #8)
        assert out["duration_sec"] == pytest.approx(1.2)
        # feature = first frame's luma grid, matching the direct compute
        _, _, jpegs = codecs.decode_avi_mjpeg(avi)
        direct = codecs.image_feature(codecs.decode_image(jpegs[0]), 16)
        assert out["feature"] == direct


class TestExtractFrames:
    def test_every_nth_frame_as_ppm(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            extract_frames)
        avi = codecs.encode_avi_mjpeg(_frames(10), quality=90)
        df = spark.createDataFrame(
            [("v1", "video", bytearray(avi)), ("bad", "video", bytearray(b"nope"))],
            "media_id string, modality string, payload binary")
        rows = {(r.media_id, r.frame_no): r
                for r in extract_frames(df, every_nth=4).collect()}
        good = sorted(fn for mid, fn in rows if mid == "v1")
        assert good == [0, 4, 8]
        r0 = rows[("v1", 0)]
        assert (r0.width, r0.height) == (32, 24)
        assert codecs.sniff_format(bytes(r0.payload)) == "ppm"
        ppm = codecs.decode_image(bytes(r0.payload))
        assert np.abs(ppm.astype(float) - _frames(1)[0].astype(float)).mean() < 2.0
        # non-AVI payload quarantines as one NULL row
        assert rows[("bad", None)].payload is None

    def test_raise_mode_propagates(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            extract_frames)
        df = spark.createDataFrame(
            [("bad", "video", bytearray(b"not an avi at all"))],
            "media_id string, modality string, payload binary")
        with pytest.raises(Exception):
            extract_frames(df, on_error="raise").collect()

    def test_plan_matches_extraction(self, spark):
        """frame_sample_plan (metadata-only explode) and extract_frames
        (real pixel path) must agree on the sampled frame numbers."""
        from go_simple_embedding_database_spark.operators.multimodal import (
            extract_frames, frame_sample_plan)
        avi = codecs.encode_avi_mjpeg(_frames(9), quality=90)
        df = spark.createDataFrame(
            [("v1", "video", bytearray(avi))],
            "media_id string, modality string, payload binary")
        plan = sorted(r.frame_no for r in frame_sample_plan(df, 3).collect())
        real = sorted(r.frame_no for r in extract_frames(df, 3).collect())
        assert plan == real == [0, 3, 6]


class TestProgressive:
    """SOF2: spectral selection + successive approximation. The encoder's
    progressive mode reuses the SAME quantized coefficients as baseline,
    so the two decodes must agree EXACTLY — any entropy-layer divergence
    (DC shift/refine, EOB runs, ZRL-in-refinement, correction-bit order)
    breaks bit equality rather than hiding inside lossy tolerance."""

    def test_matches_baseline_exactly_all_configs(self):
        img = _smooth_image(24, 32)
        for kw in ({}, {"subsample": "420"}):
            for q in (35, 85):
                b = codecs.decode_image(codecs.encode_jpeg(img, quality=q, **kw))
                p = codecs.decode_image(
                    codecs.encode_jpeg(img, quality=q, progressive=True, **kw))
                assert np.array_equal(b, p), (kw, q)

    def test_grayscale_and_ragged_sizes(self):
        img = _smooth_image(21, 13)
        for src in (img, img[:, :, 0], img[:8, :8], img[:1, :50]):
            b = codecs.decode_image(codecs.encode_jpeg(src, quality=75))
            p = codecs.decode_image(
                codecs.encode_jpeg(src, quality=75, progressive=True))
            assert np.array_equal(b, p), src.shape

    def test_noise_at_low_quality_hits_zrl_and_long_runs(self):
        # pure noise at q=20 produces sparse scattered AC coefficients:
        # verified to drive the ZRL-inside-refinement path (16+ zero runs
        # between newly-nonzero coefficients) in dozens of blocks
        rng = np.random.default_rng(99)
        img = rng.integers(0, 256, size=(40, 48, 3)).astype(np.uint8)
        for q in (20, 50):
            b = codecs.decode_image(codecs.encode_jpeg(img, quality=q))
            p = codecs.decode_image(
                codecs.encode_jpeg(img, quality=q, progressive=True))
            assert np.array_equal(b, p), q

    def test_round_trip_close_to_source(self):
        img = _smooth_image(16, 24)
        out = codecs.decode_image(
            codecs.encode_jpeg(img, quality=95, progressive=True))
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 3.0

    def test_progressive_with_restarts_rejected_on_encode(self):
        with pytest.raises(ValueError, match="restart"):
            codecs.encode_jpeg(_smooth_image(8, 8), progressive=True,
                               restart_interval=2)

    def test_eobrun_spanning_blocks_handcrafted(self):
        """A manually-built 16x8 gray SOF2 file with an all-ones quant
        table and a known coefficient layout, where the AC scans code an
        EOB2 in the FIRST block (eobrun spans both blocks). Expected
        pixels computed analytically via the same orthonormal IDCT."""
        import struct

        dc = [64, 32]                     # full-precision DC per block
        ac_k, ac_v = 1, -5                # one AC coefficient in block 0
        dc_tbl = _JpegHuffTable(codecs._JPEG_ENC_DC_BITS,
                                codecs._JPEG_ENC_DC_VALS)
        # the in-repo encoder's fixed AC table has no EOBn (r>0, s=0)
        # symbols — it only ever emits single-block EOBs — so extend it
        # with 0x10 (EOB2..EOB3 class) for this hand-built stream
        ac_bits = [0] * 7 + [163] + [0] * 8
        ac_vals = codecs._JPEG_ENC_AC_VALS + [0x10]
        ac_tbl = _JpegHuffTable(ac_bits, ac_vals)

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))            # DQT all-1
        out += seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        for tc, bits, vals in ((0, codecs._JPEG_ENC_DC_BITS,
                                codecs._JPEG_ENC_DC_VALS),
                               (1, ac_bits, ac_vals)):
            out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))

        def sos(ss, se, ah, al, writer):
            writer.byte_align()
            return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) \
                + writer.out

        # scan 1: DC first, Al=1 — diffs of dc>>1
        w = _JpegBitWriter()
        pred = 0
        for v in dc:
            size, bits = codecs._jpeg_magnitude((v >> 1) - pred)
            pred = v >> 1
            ln, code = dc_tbl.encode[size]
            w.write(code, ln)
            if size:
                w.write(bits, size)
        out += sos(0, 0, 0, 1, w)
        # scan 2: AC first 1-63, Al=1 — block0: coef at k=1 (value -5>>1
        # toward zero = -2), then EOB2 (r=1, 1 appended bit = 0 ->
        # eobrun = 2^1 + 0 = 2) covering block0's tail AND block1
        w = _JpegBitWriter()
        size, bits = codecs._jpeg_magnitude(-2)
        ln, code = ac_tbl.encode[(0 << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        ln, code = ac_tbl.encode[(1 << 4) | 0]                    # EOB2
        w.write(code, ln)
        w.write(0, 1)                                             # appended
        out += sos(1, 63, 0, 1, w)
        # scan 3: DC refine, Al=0 — one raw bit per block
        w = _JpegBitWriter()
        w.write(dc[0] & 1, 1)
        w.write(dc[1] & 1, 1)
        out += sos(0, 0, 1, 0, w)
        # scan 4: AC refine 1-63, Al=0 — EOB2 again; block0's nonzero
        # coefficient collects its correction bit from the eobrun tail
        w = _JpegBitWriter()
        ln, code = ac_tbl.encode[(1 << 4) | 0]
        w.write(code, ln)
        w.write(0, 1)                                             # appended
        w.write(abs(ac_v) & 1, 1)                                 # correction
        out += sos(1, 63, 1, 0, w)
        out += b"\xff\xd9"

        got = codecs.decode_image(bytes(out))
        # expected: IDCT of the reconstructed coefficients. AC path:
        # first scan -2<<1 = -4; refine bit 1 and (−4 & 1)==0 -> -4 + m1
        # = -5 — full precision recovered.
        expect = np.zeros((8, 16), dtype=np.float64)
        for b, dcv in enumerate(dc):
            z = np.zeros(64)
            z[0] = dcv
            if b == 0:
                z[ac_k] = ac_v
            coef = np.zeros(64)
            coef[_JPEG_ZIGZAG] = z
            blk = _JPEG_DCT_A.T @ coef.reshape(8, 8) @ _JPEG_DCT_A + 128.0
            expect[:, b * 8 : (b + 1) * 8] = blk
        expect8 = np.clip(np.round(expect), 0, 255).astype(np.uint8)
        assert got.shape == (8, 16, 3)
        assert np.array_equal(got[:, :, 0], expect8)

    def test_sniff_progressive_is_jpeg(self):
        p = codecs.encode_jpeg(_smooth_image(8, 8), progressive=True)
        assert codecs.sniff_format(p) == "jpeg"
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        meta = _decode_payload(p, "image")
        assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 8, 1)


class TestReviewRegressions:
    """Pins for review findings: spec-legal inputs that earlier decoder
    revisions rejected or mis-handled."""

    def test_fill_bytes_between_scans(self):
        """T.81 B.1.1.2: any number of 0xFF fill bytes may pad the space
        before a marker — including between progressive scans."""
        img = _smooth_image(16, 16)
        prog = codecs.encode_jpeg(img, quality=85, progressive=True)
        # inject a fill byte before every SOS after the first
        out = bytearray()
        i, n_sos = 0, 0
        while i < len(prog) - 1:
            if prog[i] == 0xFF and prog[i + 1] == 0xDA:
                n_sos += 1
                if n_sos > 1:
                    out.append(0xFF)
            out.append(prog[i])
            i += 1
        out.append(prog[-1])
        assert n_sos >= 4
        assert np.array_equal(codecs.decode_image(bytes(out)),
                              codecs.decode_image(prog))

    def test_avi_with_audio_stream_listed_first(self):
        """biCompression must come from the VIDEO stream's strf (keyed by
        the preceding strh fccType), not whichever strf appears first."""
        import struct
        frames = [_smooth_image(16, 16)]
        avi = bytearray(codecs.encode_avi_mjpeg(frames))
        # build an audio strl (strh fccType='auds' + 20-byte strf whose
        # bytes 16:20 are NOT a codec fourcc) and splice it before the
        # existing video strl inside hdrl
        def chunk(fourcc, body):
            return fourcc + struct.pack("<I", len(body)) + body \
                + (b"\x00" if len(body) & 1 else b"")
        audio_strl = chunk(b"LIST", b"strl"
                           + chunk(b"strh", b"auds" + bytes(52))
                           + chunk(b"strf", bytes(16) + b"\x16\x00\x00\x00"))
        vid = avi.find(b"LIST", 12)
        vid = avi.find(b"strl", vid)  # inside hdrl
        ins = avi.rfind(b"LIST", 0, vid)
        avi[ins:ins] = audio_strl
        # fix the hdrl LIST size and the RIFF size
        hdrl = avi.find(b"hdrl")
        old = struct.unpack_from("<I", avi, hdrl - 4)[0]
        struct.pack_into("<I", avi, hdrl - 4, old + len(audio_strl))
        struct.pack_into("<I", avi, 4, len(avi) - 8)
        w, h, jpegs = codecs.decode_avi_mjpeg(bytes(avi))
        assert (w, h, len(jpegs)) == (16, 16, 1)

    def test_avi_zero_avih_dims_fall_back_to_frame(self):
        import struct
        avi = bytearray(codecs.encode_avi_mjpeg([_smooth_image(8, 16)]))
        a = avi.find(b"avih")
        struct.pack_into("<II", avi, a + 8 + 32, 0, 0)
        w, h, _ = codecs.decode_avi_mjpeg(bytes(avi))
        assert (w, h) == (16, 8)


class TestSingleComponentScan:
    """T.81 A.2.2: a scan with ns == 1 is NON-interleaved — one data
    unit per MCU over the component's own block grid, regardless of the
    declared sampling factors. A gray baseline JPEG declaring 2x2
    sampling must decode pixel-identically to its 1x1 twin: the sampling
    factors only matter relative to hmax/vmax, and with one component
    they cancel (ADVICE r03/r04 regression — the old decoder walked it
    MCU-interleaved and misdecoded or spuriously quarantined)."""

    def test_gray_declared_2x2_sampling_decodes_identically(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
        plain = codecs.encode_jpeg(img, quality=90)
        sof = plain.find(b"\xff\xc0")
        assert plain[sof + 11] == 0x11          # encoder emits 1x1
        patched = bytearray(plain)
        patched[sof + 11] = 0x22                # declare 2x2 — same stream
        assert np.array_equal(codecs.decode_image(plain),
                              codecs.decode_image(bytes(patched)))

    def test_gray_declared_2x2_with_restart_markers(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
        plain = codecs.encode_jpeg(img, quality=85, restart_interval=2)
        sof = plain.find(b"\xff\xc0")
        patched = bytearray(plain)
        patched[sof + 11] = 0x22
        assert np.array_equal(codecs.decode_image(plain),
                              codecs.decode_image(bytes(patched)))
