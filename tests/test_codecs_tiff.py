"""Baseline TIFF codec tests — IFD walk in both byte orders, strip
assembly, gray/RGB, quarantine of compressed variants. The encoder is
the test harness (multi-strip by default), like every other format."""

import struct

import numpy as np
import pytest

from go_simple_embedding_database_spark.functions import codecs


def _img(h=11, w=7, seed=13):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)


class TestTiff:
    def test_sniff_and_round_trip_both_endians(self):
        img = _img()
        for be in (False, True):
            t = codecs.encode_tiff(img, big_endian=be)
            assert codecs.sniff_format(t) == "tiff"
            assert np.array_equal(codecs.decode_image(t), img), be

    def test_multi_strip_assembly(self):
        img = _img(h=17)
        for rps in (1, 4, 17, 100):
            t = codecs.encode_tiff(img, rows_per_strip=rps)
            assert np.array_equal(codecs.decode_tiff(t), img), rps

    def test_gray_expands_and_whiteiszero_inverts(self):
        g = (np.arange(40, dtype=np.int64).reshape(5, 8) * 6).astype(np.uint8)
        t = codecs.encode_tiff(g)
        out = codecs.decode_tiff(t)
        assert np.array_equal(out[:, :, 1], g)
        # flip photometric to WhiteIsZero (tag 262 value 0)
        b = bytearray(t)
        # find the IFD entry for tag 262 and zero its value halfword
        n = struct.unpack("<H", b[8:10])[0]
        for i in range(n):
            e = 10 + 12 * i
            if struct.unpack("<H", b[e : e + 2])[0] == 262:
                struct.pack_into("<H", b, e + 8, 0)
        inv = codecs.decode_tiff(bytes(b))
        assert np.array_equal(inv[:, :, 0], 255 - g)

    def test_unsupported_compression_and_truncation_quarantine(self):
        t = bytearray(codecs.encode_tiff(_img()))
        n = struct.unpack("<H", t[8:10])[0]
        for i in range(n):
            e = 10 + 12 * i
            if struct.unpack("<H", t[e : e + 2])[0] == 259:
                struct.pack_into("<H", t, e + 8, 7)       # JPEG-in-TIFF
        with pytest.raises(ValueError, match="not supported"):
            codecs.decode_tiff(bytes(t))
        good = codecs.encode_tiff(_img())
        with pytest.raises(ValueError):
            codecs.decode_tiff(good[: len(good) - 20])

    def test_lzw_and_packbits_round_trip(self):
        rng = np.random.default_rng(17)
        # mix of compressible structure and noise, ragged strip sizes
        img = _img(h=23, w=19, seed=17)
        img[::3] = img[0]                 # repeated rows compress well
        for comp in ("lzw", "packbits"):
            for rps in (1, 5, 23):
                t = codecs.encode_tiff(img, compression=comp,
                                       rows_per_strip=rps)
                assert np.array_equal(codecs.decode_tiff(t), img), (comp, rps)
        # LZW with the horizontal-differencing predictor (its usual pair)
        t = codecs.encode_tiff(img, compression="lzw", predictor=2)
        assert np.array_equal(codecs.decode_tiff(t), img)
        g = (np.arange(48, dtype=np.int64).reshape(6, 8) * 5).astype(np.uint8)
        t = codecs.encode_tiff(g, compression="packbits", predictor=2)
        assert np.array_equal(codecs.decode_tiff(t)[:, :, 0], g)

    def test_lzw_table_overflow(self):
        # enough entropy to roll the 12-bit table through a CLEAR
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.int64) \
            .astype(np.uint8)
        t = codecs.encode_tiff(img, compression="lzw", rows_per_strip=64)
        assert np.array_equal(codecs.decode_tiff(t), img)

    def test_lzw_truncated_stream(self):
        img = _img()
        t = codecs.encode_tiff(img, compression="lzw", rows_per_strip=100)
        with pytest.raises(ValueError):
            codecs.decode_tiff(t[: len(t) - 25])

    def test_decode_payload_and_resize_wiring(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            _decode_payload, resize_media)
        img = _img(h=10, w=12)
        t = codecs.encode_tiff(img)
        meta = _decode_payload(t, "image")
        assert (meta["width"], meta["height"], meta["n_frames"]) == (12, 10, 1)
        assert meta["feature"] == codecs.image_feature(img, 16)
        df = spark.createDataFrame(
            [("t", "image", bytearray(t))],
            "media_id string, modality string, payload binary")
        row = resize_media(df, 5, 5).collect()[0]
        assert np.array_equal(codecs.decode_image(bytes(row.payload)),
                              codecs.resize_nearest(img, 5, 5))
