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

    def test_decode_payload_video_is_real(self):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload)
        avi = codecs.encode_avi_mjpeg(_frames(12), quality=90)
        out = _decode_payload(avi, "video")
        assert (out["width"], out["height"], out["n_frames"]) == (32, 24, 12)
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
