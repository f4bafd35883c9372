"""Dependency-free media codec layer (functions/codecs.py): real decode /
resize / feature extraction for PPM, PGM, BMP and PCM WAV, plus the
integration with decode_media / resize_media (real path vs sha-fallback
vs quarantine)."""

import struct

import numpy as np
import pytest

from go_simple_embedding_database_spark.functions import codecs


def _ppm(w, h, fill=None):
    arr = (np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
           if fill is None else np.full((h, w, 3), fill, dtype=np.uint8))
    return codecs.encode_ppm(arr), arr


def _bmp24(arr):
    """Minimal bottom-up 24-bit BI_RGB BMP encoder (test-only)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in arr[::-1]:  # bottom-up
        line = row[:, [2, 1, 0]].astype(np.uint8).tobytes()  # RGB->BGR
        raster += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


def _wav16(samples, rate=8000, channels=1):
    data = (np.asarray(samples) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestImageCodec:
    def test_ppm_round_trip(self):
        payload, arr = _ppm(5, 3)
        out = codecs.decode_image(payload)
        assert out.shape == (3, 5, 3)
        assert np.array_equal(out, arr)

    def test_ppm_header_comments_and_whitespace(self):
        _, arr = _ppm(2, 2)
        payload = b"P6 # a comment\n# another\n 2\t2\n255\n" + arr.tobytes()
        assert np.array_equal(codecs.decode_image(payload), arr)

    def test_pgm_expands_to_rgb(self):
        gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
        payload = b"P5\n3 2\n255\n" + gray.tobytes()
        out = codecs.decode_image(payload)
        assert out.shape == (2, 3, 3)
        assert np.array_equal(out[:, :, 0], gray)
        assert np.array_equal(out[:, :, 1], gray)

    def test_bmp_round_trip_with_row_padding(self):
        # width 3 -> 9-byte rows padded to 12: exercises the stride path
        arr = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
        assert np.array_equal(codecs.decode_image(_bmp24(arr)), arr)

    def test_truncated_raster_raises(self):
        payload, _ = _ppm(4, 4)
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_image(payload[:-5])

    def test_compressed_bmp_raises(self):
        arr = np.zeros((2, 2, 3), dtype=np.uint8)
        p = bytearray(_bmp24(arr))
        struct.pack_into("<I", p, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="compressed BMP"):
            codecs.decode_image(bytes(p))

    def test_resize_nearest_exact_indices(self):
        _, arr = _ppm(4, 2)
        small = codecs.resize_nearest(arr, 2, 1)
        # pixel centers: rows [1], cols [1, 3]
        assert np.array_equal(small, arr[[1]][:, [1, 3]])
        big = codecs.resize_nearest(arr, 8, 4)
        assert big.shape == (4, 8, 3)

    def test_image_feature_is_unit_and_locality_sensitive(self):
        p1, _ = _ppm(16, 16, fill=10)
        p2, _ = _ppm(16, 16, fill=12)
        p3, _ = _ppm(16, 16, fill=245)
        f1 = np.array(codecs.image_feature(codecs.decode_image(p1)))
        f2 = np.array(codecs.image_feature(codecs.decode_image(p2)))
        f3 = np.array(codecs.image_feature(codecs.decode_image(p3)))
        assert abs(np.linalg.norm(f1) - 1.0) < 1e-9
        # near-identical images -> near-identical features; a bright image
        # points the other way along the luma axis
        assert f1 @ f2 > 0.999
        assert f1 @ f3 < 0


class TestWavCodec:
    def test_pcm16_round_trip(self):
        t = np.linspace(0, 1, 800, endpoint=False)
        wave = 0.5 * np.sin(2 * np.pi * 5 * t)
        rate, samples = codecs.decode_wav(_wav16(wave))
        assert rate == 8000 and samples.shape == (800, 1)
        assert np.allclose(samples[:, 0], wave, atol=1e-3)

    def test_stereo_shape(self):
        stereo = np.stack([np.ones(100) * 0.1, np.ones(100) * -0.1], axis=1)
        _, samples = codecs.decode_wav(
            _wav16(stereo.reshape(-1), channels=2))
        assert samples.shape == (100, 2)

    def test_non_pcm_raises(self):
        p = bytearray(_wav16(np.zeros(10)))
        struct.pack_into("<H", p, 20, 3)  # IEEE float tag
        with pytest.raises(ValueError, match="PCM"):
            codecs.decode_wav(bytes(p))

    def test_audio_feature_tracks_envelope(self):
        loud_then_quiet = np.concatenate(
            [np.ones(400) * 0.9, np.ones(400) * 0.01])
        f = codecs.audio_feature(loud_then_quiet.reshape(-1, 1), dim=16)
        assert abs(np.linalg.norm(f) - 1.0) < 1e-9
        assert min(f[:8]) > max(f[8:])


class TestDecodeMediaIntegration:
    def _media_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "media_id string, modality string, payload binary")

    def test_real_formats_decode_with_true_dimensions(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            decode_media)
        ppm, _ = _ppm(7, 5)
        wav = _wav16(np.zeros(1600))  # 0.2 s at 8 kHz
        df = self._media_df(spark, [
            ("img", "image", bytearray(ppm)),
            ("aud", "audio", bytearray(wav)),
            ("other", "image", bytearray(b"\xff\xd8not-really-jpeg")),
            ("broken", "image", bytearray(ppm[:-20])),  # truncated raster
        ])
        rows = {r.media_id: r for r in decode_media(df).collect()}
        assert (rows["img"].width, rows["img"].height) == (7, 5)
        assert rows["img"].n_frames == 1
        assert rows["aud"].width is None
        assert rows["aud"].n_frames == 20  # centisecond granules
        assert rows["other"].feature is not None  # sha fallback still works
        assert rows["broken"].feature is None  # quarantined

    def test_resize_reencodes_real_images_as_ppm(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            resize_media)
        ppm, arr = _ppm(8, 8)
        df = self._media_df(spark, [("img", "image", bytearray(ppm))])
        out = resize_media(df, 4, 4).collect()[0]
        assert (out.width, out.height) == (4, 4)
        resized = codecs.decode_image(bytes(out.payload))
        assert np.array_equal(resized, codecs.resize_nearest(arr, 4, 4))


def _png_chunk(ctype, data):
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png_pack_rows(a, depth):
    """Pack one (sub)image's samples into per-row byte arrays at the
    given bit depth: 8 -> bytes as-is, 16 -> big-endian sample pairs,
    1/2/4 -> MSB-first bit packing."""
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch)
    if depth == 8:
        return flat.astype(np.uint8)
    if depth == 16:
        out = np.zeros((h, w * ch * 2), dtype=np.uint8)
        out[:, 0::2] = (flat >> 8).astype(np.uint8)
        out[:, 1::2] = (flat & 0xFF).astype(np.uint8)
        return out
    bits = ((flat[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1)
    bits = bits.reshape(h, -1).astype(np.uint8)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def _png_filter_image(a, filters, depth=8):
    """Forward-filter one (sub)image — rows of a HxWxC block — with the
    requested per-row filter types; returns the filtered byte stream."""
    h, w, ch = a.shape
    bpp = max(1, ch * depth // 8)
    rows = _png_pack_rows(a, depth).astype(np.int64)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.int64)
    for y, ftype in zip(range(h), filters):
        cur = rows[y]
        filt = np.zeros_like(cur)
        for i in range(len(cur)):
            left = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8).tobytes())
        prev = cur
    return bytes(raw)


def _png(arr, color_type=2, filters=None, plte=None, depth=8, interlace=0):
    """Minimal PNG encoder (test-only): forward-filters each scanline with
    the requested filter type so every unfilter branch is exercised
    against ground-truth pixels. ``arr`` is HxW (gray/palette index) or
    HxWxC matching ``color_type``'s channel count. ``interlace=1``
    serializes the seven Adam7 reduced images back to back, each
    independently filtered (spec §8.2). ``depth`` packs samples at
    1/2/4/8/16 bits (16 = big-endian)."""
    import zlib
    a = np.asarray(arr, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if interlace == 1:
        raw = bytearray()
        for x0, y0, dx, dy in codecs._PNG_ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _png_filter_image(
                    sub, filters and filters[: sub.shape[0]], depth)
        raw = bytes(raw)
    else:
        raw = _png_filter_image(a, filters, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = codecs._PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


class TestPngCodec:
    def test_sniff_and_rgb_round_trip_all_filters(self):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.int64)
        payload = _png(arr, color_type=2, filters=[0, 1, 2, 3, 4])
        assert codecs.sniff_format(payload) == "png"
        assert np.array_equal(codecs.decode_image(payload),
                              arr.astype(np.uint8))

    def test_gray_expands_to_rgb(self):
        gray = np.arange(12, dtype=np.int64).reshape(3, 4) * 20
        out = codecs.decode_image(_png(gray, color_type=0, filters=[4, 3, 1]))
        assert out.shape == (3, 4, 3)
        assert np.array_equal(out[:, :, 1], gray.astype(np.uint8))

    def test_rgba_drops_alpha_and_gray_alpha(self):
        rng = np.random.default_rng(11)
        rgba = rng.integers(0, 256, size=(2, 3, 4), dtype=np.int64)
        out = codecs.decode_image(_png(rgba, color_type=6, filters=[4, 2]))
        assert np.array_equal(out, rgba[:, :, :3].astype(np.uint8))
        ga = rng.integers(0, 256, size=(2, 2, 2), dtype=np.int64)
        out2 = codecs.decode_image(_png(ga, color_type=4, filters=[1, 4]))
        assert np.array_equal(out2[:, :, 0], ga[:, :, 0].astype(np.uint8))

    def test_adam7_interlaced_round_trip(self):
        rng = np.random.default_rng(23)
        # sizes straddling the 8x8 Adam7 tile: sub-tile, exact, ragged
        for h, w in ((3, 5), (8, 8), (13, 11), (1, 9), (9, 1)):
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
            got = codecs.decode_image(
                _png(arr, color_type=2, filters=[4, 2, 1, 3, 0] * h,
                     interlace=1))
            assert np.array_equal(got, arr.astype(np.uint8)), (h, w)

    def test_adam7_gray_and_truncated(self):
        gray = (np.arange(90, dtype=np.int64).reshape(9, 10) * 2)
        out = codecs.decode_image(_png(gray, color_type=0, interlace=1))
        assert np.array_equal(out[:, :, 0], gray.astype(np.uint8))
        import struct as _s
        import zlib as _z
        full = _png(gray, color_type=0, interlace=1)
        # rebuild with the last pass chopped off -> truncated stream error
        a = gray[:, :, None]
        raw = bytearray()
        for x0, y0, dx, dy in codecs._PNG_ADAM7[:-1]:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _png_filter_image(sub, None)
        bad = (codecs._PNG_SIGNATURE
               + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 10, 9, 8, 0, 0, 0, 1))
               + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_image(bad)
        assert codecs.decode_image(full) is not None

    def test_16bit_keeps_high_byte(self):
        rng = np.random.default_rng(29)
        a16 = rng.integers(0, 65536, size=(5, 7, 3), dtype=np.int64)
        out = codecs.decode_image(_png(a16, color_type=2, depth=16,
                                       filters=[0, 1, 2, 3, 4]))
        assert np.array_equal(out, (a16 >> 8).astype(np.uint8))
        g16 = rng.integers(0, 65536, size=(4, 3), dtype=np.int64)
        out2 = codecs.decode_image(_png(g16, color_type=0, depth=16))
        assert np.array_equal(out2[:, :, 0], (g16 >> 8).astype(np.uint8))

    def test_sub_byte_gray_rescales(self):
        rng = np.random.default_rng(31)
        for depth in (1, 2, 4):
            top = (1 << depth) - 1
            g = rng.integers(0, top + 1, size=(6, 11), dtype=np.int64)
            out = codecs.decode_image(_png(g, color_type=0, depth=depth,
                                           filters=[0, 2, 1, 0, 2, 1]))
            assert np.array_equal(
                out[:, :, 0], (g * (255 // top)).astype(np.uint8)), depth

    def test_sub_byte_palette_and_interlace(self):
        plte = bytes(range(48))                       # 16 RGB entries
        rng = np.random.default_rng(37)
        idx = rng.integers(0, 16, size=(9, 10), dtype=np.int64)
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        out = codecs.decode_image(_png(idx, color_type=3, plte=plte, depth=4))
        assert np.array_equal(out, table[idx])
        # 1-bit gray, Adam7: per-pass bit packing with ragged pass widths
        bits = rng.integers(0, 2, size=(13, 9), dtype=np.int64)
        out2 = codecs.decode_image(_png(bits, color_type=0, depth=1,
                                        interlace=1))
        assert np.array_equal(out2[:, :, 0], (bits * 255).astype(np.uint8))

    def test_palette_lookup(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
        idx = np.array([[0, 1], [2, 0]], dtype=np.int64)
        out = codecs.decode_image(_png(idx, color_type=3, plte=plte,
                                       filters=[2, 1]))
        expect = np.array([[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8)
        assert np.array_equal(out, expect)

    def test_rejects_unsupported_and_corrupt(self):
        arr = np.zeros((2, 2, 3), dtype=np.int64)
        with pytest.raises(ValueError, match="bit depth"):
            codecs.decode_image(_png(arr, depth=3))
        with pytest.raises(ValueError, match="sub-byte"):
            codecs.decode_image(_png(arr, depth=4))
        with pytest.raises(ValueError, match="interlace"):
            codecs.decode_image(_png(arr, interlace=2))
        with pytest.raises(ValueError, match="palette"):
            codecs.decode_image(_png(np.array([[0, 3]]), color_type=3,
                                     plte=bytes([1, 2, 3])))
        good = _png(arr)
        flipped = bytearray(good)
        flipped[-17] ^= 0xFF  # corrupt a byte inside the IDAT chunk body
        with pytest.raises(ValueError, match="CRC|DEFLATE"):
            codecs.decode_image(bytes(flipped))
        # truncated pixel stream: valid zlib, too few scanline bytes
        import zlib as _z
        short = _png(arr)
        rebuilt = (codecs._PNG_SIGNATURE
                   + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
                   + _png_chunk(b"IDAT", _z.compress(b"\x00" * 5))
                   + _png_chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_image(rebuilt)

    def test_decode_media_png_real_path(self, spark):
        from go_simple_embedding_database_spark.operators.multimodal import (
            decode_media, resize_media)
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(6, 9, 3), dtype=np.int64)
        payload = _png(arr, color_type=2, filters=[0, 1, 2, 3, 4, 1])
        df = spark.createDataFrame(
            [("p", "image", bytearray(payload))],
            "media_id string, modality string, payload binary")
        row = decode_media(df).collect()[0]
        assert (row.width, row.height) == (9, 6)
        assert row.feature == codecs.image_feature(arr.astype(np.uint8))
        resized = resize_media(df, 3, 3).collect()[0]
        assert np.array_equal(
            codecs.decode_image(bytes(resized.payload)),
            codecs.resize_nearest(arr.astype(np.uint8), 3, 3))


def _wav_generic(samples, fmt_tag, bits, rate=8000, channels=1,
                 extensible=False):
    """Build a WAV with arbitrary format tag / bit depth for decode tests."""
    s = np.asarray(samples, dtype=np.float64)
    if fmt_tag == 3:
        data = s.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 24:
        v = np.round(s * 8388607).astype(np.int64)
        b = np.zeros((v.size, 3), dtype=np.uint8)
        u = v & 0xFFFFFF
        b[:, 0], b[:, 1], b[:, 2] = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
        data = b.tobytes()
    elif bits == 32:
        data = np.round(s * 2147483647).astype("<i4").tobytes()
    else:
        raise AssertionError
    block = bits // 8 * channels
    if extensible:
        fmt = struct.pack("<HHIIHH", 0xFFFE, channels, rate,
                          rate * block, block, bits)
        fmt += struct.pack("<HHI", 22, bits, 0x4)
        fmt += struct.pack("<H", fmt_tag) + bytes(14)   # GUID head = tag
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                          rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestWavDepthsAndFloat:
    def test_float32_float64_and_deep_pcm(self):
        t = np.linspace(0, 1, 200)
        s = 0.5 * np.sin(2 * np.pi * 5 * t)
        for tag, bits, tol in ((3, 32, 1e-6), (3, 64, 1e-12),
                               (1, 24, 2e-7), (1, 32, 1e-9)):
            rate, out = codecs.decode_wav(_wav_generic(s, tag, bits))
            assert rate == 8000 and out.shape == (200, 1), (tag, bits)
            assert np.abs(out[:, 0] - s).max() < tol, (tag, bits)

    def test_extensible_wrapper_and_negative_24bit(self):
        s = np.array([-1.0, -0.5, 0.0, 0.5, 0.99])
        _, out = codecs.decode_wav(
            _wav_generic(s, 1, 24, extensible=True))
        assert np.abs(out[:, 0] - s).max() < 2e-6
        _, out2 = codecs.decode_wav(
            _wav_generic(s, 3, 32, extensible=True))
        assert np.abs(out2[:, 0] - s).max() < 1e-6

    def test_unsupported_still_quarantines(self):
        wav = bytearray(_wav_generic(np.zeros(4), 3, 32))
        struct.pack_into("<H", wav, wav.find(b"fmt ") + 8, 7)  # mu-law tag
        with pytest.raises(ValueError, match="unsupported WAV"):
            codecs.decode_wav(bytes(wav))
