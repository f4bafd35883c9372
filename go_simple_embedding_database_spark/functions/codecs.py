"""Pure-python/numpy media codecs for the multimodal operators.

The container ships no PIL/ffmpeg/torchaudio, so the codec layer is
self-contained: real decoders for the container formats implementable
with the stdlib + numpy alone — binary PPM/PGM (netpbm P6/P5), 24/32-bit
uncompressed BMP, WAV (8/16/24/32-bit PCM, IEEE float,
WAVE_FORMAT_EXTENSIBLE), 8-bit PNG incl. Adam7 interlace (DEFLATE is
stdlib ``zlib``; the scanline unfiltering is implemented here), and baseline
sequential JPEG (ITU-T T.81: Huffman entropy decode, dequantize, 8x8
IDCT, chroma upsampling, YCbCr->RGB — all implemented here; the IDCT and
dequantization are bulk numpy over every block at once, the bit-serial
Huffman walk is the per-record CPU cost that ``mapInPandas`` spreads
across executors), GIF87a/89a including animation (in-repo LZW decode,
palette mapping, interlace, frame compositing with disposal),
baseline TIFF — uncompressed, LZW and PackBits strips, horizontal-
differencing predictor, both byte orders — and
Motion-JPEG AVI video (RIFF walk + per-frame JPEG). Formats whose
codecs remain out of reach for
stdlib+numpy (MP3, MP4) still fall back to the
clearly-marked deterministic fake in ``operators.multimodal``, keeping
every downstream operator exercisable on arbitrary bytes.

``encode_jpeg`` exists so the JPEG decode path is testable end-to-end
without any binary fixtures: it emits spec-valid baseline streams
(interleaved single scan, 4:4:4 or 4:2:0, optional restart markers) with
simple fixed-length Huffman tables — legal JPEG, just not size-optimal.

All functions are pure bytes -> numpy (no Spark imports): they run inside
``mapInPandas`` workers, one Arrow batch of payloads per call, and are
unit-testable without a session.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "sniff_format",
    "decode_image",
    "encode_ppm",
    "encode_jpeg",
    "decode_avi_mjpeg",
    "encode_avi_mjpeg",
    "decode_gif",
    "encode_gif",
    "decode_tiff",
    "encode_tiff",
    "resize_nearest",
    "decode_wav",
    "image_feature",
    "audio_feature",
    "parse_mp3",
    "parse_mp4",
    "gif_frame_count",
    "gif_scan",
    "avi_frame_period_usec",
]

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard (the PIL MAX_IMAGE_PIXELS analog): header-
# declared dimensions are UNTRUSTED until the canvas they imply is
# bounded — a 360-byte GIF whose screen descriptor claims 65535x32767
# would otherwise allocate a 6.4 GB RGBA canvas and burn ~90 s of CPU in
# per-frame copies before "succeeding" (found by the round-7 codec fuzz
# run; JPEG's SOF dims feed an even larger per-component coefficient
# store). 2**26 pixels (= 8192x8192) comfortably covers training-corpus
# images; a caller with legitimately larger scans can raise the module
# attribute. Exceeding it raises ValueError — the quarantine path.
MAX_DECODE_PIXELS = 1 << 26


def _check_decode_pixels(w: int, h: int, what: str) -> None:
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{what} dimensions {w}x{h} exceed MAX_DECODE_PIXELS "
            f"({MAX_DECODE_PIXELS}) — decompression-bomb guard")


# Known DIB header sizes (BITMAPCOREHEADER excluded — 24-bit core BMPs
# are extinct; decode_image requires >= 40 anyway).
_BMP_DIB_SIZES = frozenset({40, 52, 56, 108, 124})


def sniff_format(payload: bytes) -> str | None:
    """Container format sniff: 'ppm' | 'pgm' | 'bmp' | 'wav' | 'png' |
    'jpeg' | 'gif' | 'avi' | 'tiff' | 'mp4' | 'mp3', or None for bytes
    this codec layer can neither decode nor parse.

    Deliberately STRICTER than the bare magic bytes: a media column can
    legitimately carry arbitrary bytes (text wrapped as payloads in
    tests/benches, unknown formats in a real corpus), and a sniff that
    claims such bytes are media routes them into the real decoder where
    they quarantine as "corrupt" instead of falling back to the hash
    feature. So BMP additionally requires a known DIB header size at
    offset 14 (ASCII text can never satisfy it), PNM requires a digit or
    comment after the whitespace (a prose word starting 'P6 ' does not),
    and WAV requires the full 12-byte RIFF/WAVE sandwich."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:2] in (b"P6", b"P5") and payload[2:3] in b" \t\n\r":
        rest = payload[3:].lstrip(b" \t\n\r")
        if rest[:1].isdigit() or rest[:1] == b"#":
            return "ppm" if payload[:2] == b"P6" else "pgm"
        return None
    if payload[:2] == b"BM" and len(payload) >= 54:
        dib = struct.unpack_from("<I", payload, 14)[0]
        if dib in _BMP_DIB_SIZES:
            return "bmp"
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:8] == _PNG_SIGNATURE:
        # the 8-byte signature includes non-ASCII and CR/LF bytes by
        # design (it cannot occur in text), so no extra strictness needed
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        # SOI immediately followed by another marker byte — the 3-byte
        # prefix is non-ASCII, so text can never satisfy it
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 13:
        return "gif"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[4:8] == b"ftyp":
        # ISO-BMFF: a sane first-box size is the text guard — ASCII text
        # at offset 0 reads as a big-endian size >= 0x20202020 (~539 MB),
        # which can never fit inside the payload it came from
        size = struct.unpack_from(">I", payload, 0)[0]
        if 8 <= size <= len(payload):
            return "mp4"
    if payload[:3] == b"ID3" and len(payload) >= 10 and all(
            b < 0x80 for b in payload[6:10]):
        return "mp3"
    if payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0 and \
            _mp3_frame_header(payload, 0) is not None:
        # frame sync + a fully-valid header (version/layer/bitrate/rate
        # fields); the leading 0xFF cannot occur in text
        return "mp3"
    return None


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P5/P6 header: returns (width, height, maxval, data_offset).
    Netpbm allows '#' comments and arbitrary whitespace between tokens."""
    pos = 2
    tokens: list[int] = []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        try:
            tokens.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError(f"bad PNM header token {payload[start:pos]!r}") from e
    # exactly ONE whitespace byte separates the header from raster data
    pos += 1
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"bad PNM dimensions {w}x{h} maxval={maxval}")
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return w, h, maxval, pos


def decode_image(payload: bytes) -> np.ndarray:
    """bytes -> HxWx3 uint8 RGB array. Supports binary PPM (P6), binary
    PGM (P5, expanded to RGB), uncompressed 24/32-bit BI_RGB BMP,
    8-bit PNG, baseline sequential JPEG, and GIF (first frame).
    Raises ValueError on truncated/unsupported payloads — the quarantine
    path of ``decode_media``."""
    kind = sniff_format(payload)
    if kind == "ppm":
        w, h, _, off = _pnm_header(payload)
        need = w * h * 3
        raster = payload[off : off + need]
        if len(raster) < need:
            raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()
    if kind == "pgm":
        w, h, _, off = _pnm_header(payload)
        need = w * h
        raster = payload[off : off + need]
        if len(raster) < need:
            raise ValueError(f"truncated PGM raster: {len(raster)} < {need}")
        gray = np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
        return np.repeat(gray[:, :, None], 3, axis=2).copy()
    if kind == "bmp":
        return _decode_bmp(payload)
    if kind == "png":
        return _decode_png(payload)
    if kind == "jpeg":
        return _decode_jpeg(payload)
    if kind == "gif":
        # first composited frame — the still-image view of a GIF; stop
        # the decode there instead of paying for the whole animation
        _, _, frames = decode_gif(payload, max_frames=1)
        return frames[0]
    if kind == "tiff":
        return decode_tiff(payload)
    raise ValueError("unsupported image format for the built-in codec")


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:  # BI_RGB only
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise ValueError(f"only 24/32-bit BMP supported, got {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    h = abs(h_raw)
    bytes_pp = bpp // 8
    # rows are padded to 4-byte boundaries
    stride = (w * bytes_pp + 3) & ~3
    need = stride * h
    raster = payload[data_offset : data_offset + need]
    if len(raster) < need:
        raise ValueError(f"truncated BMP raster: {len(raster)} < {need}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    if h_raw > 0:  # positive height = bottom-up row order
        rgb = rgb[::-1]
    return rgb.copy()


# PNG color types: value -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (x start, y start, x step, y step) — spec §8.2
_PNG_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the PNG per-scanline filters (spec §9): each row is one
    filter-type byte + ``stride`` filtered bytes. Up is fully vectorized;
    Sub/Average/Paeth have a true byte-serial dependency within the row
    (each byte needs the already-RECONSTRUCTED byte bpp to its left), so
    those rows run a per-byte loop — exact, and cheap at the row widths a
    feature-extraction pipeline resizes anyway."""
    need = h * (1 + stride)
    if len(raw) < need:
        raise ValueError(f"truncated PNG pixel stream: {len(raw)} < {need}")
    rows = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if ftype == 0:                      # None
            rec = cur
        elif ftype == 2:                    # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):            # Sub / Average / Paeth
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 1:
                    rec[i] = (rec[i] + a) & 0xFF
                elif ftype == 3:
                    rec[i] = (rec[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _png_samples(raw: bytes, off: int, pw: int, ph: int, channels: int,
                 depth: int) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub)image of ``pw``x``ph`` pixels starting
    at byte ``off`` of the inflated stream. Returns ((ph, pw, channels)
    uint8 samples, bytes consumed). Depth mapping to 8-bit: 16-bit takes
    the high byte (the spec's sample-depth rescale truncated to the
    precision the feature path keeps anyway); 1/2/4-bit unpack MSB-first
    as raw level values (the gray rescale happens in the caller, where
    palette indices — which must NOT be rescaled — are distinguishable)."""
    stride = (pw * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    need = ph * (1 + stride)
    rec = _png_unfilter(raw[off : off + need], ph, stride, bpp)
    if depth == 8:
        px = rec.reshape(ph, pw, channels)
    elif depth == 16:
        px = rec.reshape(ph, -1)[:, 0::2].reshape(ph, pw, channels)
    else:
        bits = np.unpackbits(rec, axis=1)[:, : pw * channels * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (bits.reshape(ph, pw * channels, depth) * weights).sum(axis=2)
        px = vals.reshape(ph, pw, channels).astype(np.uint8)
    return px, need


def _png_deinterlace(raw: bytes, w: int, h: int, channels: int,
                     depth: int) -> np.ndarray:
    """Adam7: the pixel stream holds up to seven reduced images back to
    back, each independently filtered (spec §8.2); unfilter each pass and
    scatter it onto the (y0::dy, x0::dx) grid of the full image."""
    out = np.zeros((h, w, channels), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _PNG_ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue                      # empty pass emits zero bytes
        sub, used = _png_samples(raw, off, pw, ph, channels, depth)
        off += used
        out[y0::dy, x0::dx] = sub
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode (no PIL): signature + chunk walk with CRC checks,
    stdlib-zlib inflate of the IDAT stream, per-scanline unfiltering, and
    color-type mapping to HxWx3 RGB. Supports the common training-corpus
    shape — color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA); bit depths 8 and 16 (high byte kept), plus 1/2/4-bit gray
    and palette; both non-interlaced and Adam7-interlaced. Invalid
    depth/color-type combinations raise ValueError (the quarantine
    path), as do CRC mismatches and truncated streams."""
    pos, n = len(_PNG_SIGNATURE), len(payload)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color_type, compression, filt, interlace = ihdr
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    _check_decode_pixels(w, h, "PNG")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {depth}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"sub-byte depth {depth} invalid for color type {color_type}")
    if depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if compression != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from e
    if interlace == 1:
        px = _png_deinterlace(raw, w, h, channels, depth)
    else:
        px, _ = _png_samples(raw, 0, w, h, channels, depth)
    if depth < 8 and color_type == 0:
        # rescale level values to full 8-bit range (exact: 255/1, 255/3,
        # 255/15 are all integers); palette indices stay raw
        px = px * np.uint8(255 // ((1 << depth) - 1))
    if color_type == 2:                     # RGB
        return px.copy()
    if color_type == 6:                     # RGBA -> drop alpha
        return px[:, :, :3].copy()
    if color_type == 0:                     # gray
        return np.repeat(px, 3, axis=2).copy()
    if color_type == 4:                     # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    # palette
    if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
        raise ValueError("paletted PNG missing a valid PLTE chunk")
    table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= table.shape[0]:
        raise ValueError("PNG palette index out of range")
    return table[idx].copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6) bytes — the codec's native output
    format (what ``resize_media`` re-emits)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the only interpolation that is exactly
    reproducible with pure integer index math — no filter-kernel
    implementation drift). Index i maps to floor((i + 0.5) * src/dst),
    the standard pixel-center convention."""
    h, w = arr.shape[:2]
    rows = ((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64)
    cols = ((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64)
    return arr[np.clip(rows, 0, h - 1)][:, np.clip(cols, 0, w - 1)]


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """bytes -> (sample_rate, samples float64 in [-1, 1], shape (n, ch)).
    PCM 8/16/24/32-bit (format tag 1), IEEE float 32/64 (tag 3), and
    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping either; raises
    ValueError otherwise."""
    if sniff_format(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    sub_fmt = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if len(body) >= 26:     # extensible: real tag leads the GUID
                sub_fmt = struct.unpack_from("<H", body, 24)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 0xFFFE and sub_fmt is not None:
        audio_fmt = sub_fmt
    if channels < 1:
        raise ValueError("WAV with zero channels")
    frame = bits // 8 * channels
    data = data[: len(data) - (len(data) % frame if frame else 0)]
    if audio_fmt == 3 and bits in (32, 64):      # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        raw = np.frombuffer(data, dtype=dt).astype(np.float64)
    elif audio_fmt == 1 and bits == 8:
        raw = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 24:
        b3 = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = (b3[:, 0].astype(np.int64)
             | (b3[:, 1].astype(np.int64) << 8)
             | (b3[:, 2].astype(np.int64) << 16))
        v -= (v >> 23) << 24                      # sign-extend 24 bits
        raw = v.astype(np.float64) / 8388608.0
    elif audio_fmt == 1 and bits == 32:
        raw = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt}, bits={bits}) — "
            "8/16/24/32-bit PCM or 32/64-bit IEEE float only")
    return rate, raw.reshape(-1, channels)


def image_feature(rgb: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic ``dim``-length descriptor of a decoded image: the
    luma averaged over a 4x4 grid (dim=16), L2-normalized — the classic
    tiny-thumbnail embedding that makes near-duplicate pixels land near
    each other in cosine space (what the perceptual-dedup operators
    consume). Pure integer-count averaging, so bit-stable everywhere."""
    side = int(np.sqrt(dim))
    if side * side != dim:
        raise ValueError(f"dim must be a perfect square, got {dim}")
    luma = (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
    h, w = luma.shape
    ys = np.linspace(0, h, side + 1).astype(np.int64)
    xs = np.linspace(0, w, side + 1).astype(np.int64)
    cells = [
        luma[ys[i] : max(ys[i + 1], ys[i] + 1),
             xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
        for i in range(side) for j in range(side)
    ]
    v = np.array(cells) / 255.0 * 2.0 - 1.0
    norm = np.linalg.norm(v)
    return (v / norm if norm else v).tolist()


def audio_feature(samples: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic ``dim``-length descriptor of decoded audio: RMS
    energy over ``dim`` equal time windows (channel-averaged),
    L2-normalized — the envelope signature used for near-dup grouping."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        raise ValueError("empty audio stream")
    edges = np.linspace(0, n, dim + 1).astype(np.int64)
    v = np.array([
        np.sqrt(np.mean(np.square(mono[edges[i] : max(edges[i + 1], edges[i] + 1)])))
        for i in range(dim)
    ])
    norm = np.linalg.norm(v)
    return (v / norm if norm else v).tolist()


# --------------------------------------------------------------------------
# Baseline sequential JPEG (ITU-T T.81) — decoder + test encoder.
#
# Scope: 8-bit baseline/extended-sequential Huffman (SOF0/SOF1), 1 or 3
# components, one interleaved scan, integer chroma subsampling ratios,
# restart markers — PLUS progressive (SOF2): spectral selection and
# successive approximation, DC/AC first and refinement scans, EOB runs.
# Hierarchical, arithmetic coding and 12-bit depth raise ValueError —
# the quarantine path, exactly like unsupported PNG shapes.
# --------------------------------------------------------------------------


def _build_zigzag() -> np.ndarray:
    """zigzag index k -> row-major flat position (T.81 Figure A.6): walk
    the anti-diagonals, alternating direction, starting up-right."""
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:           # even diagonal: up-right (row decreasing)
            rows = reversed(list(rows))
        order.extend(r * 8 + (s - r) for r in rows)
    return np.array(order, dtype=np.int64)


_JPEG_ZIGZAG = _build_zigzag()

# Orthonormal 8-point DCT-II matrix A (A @ A.T == I): forward block
# transform is A @ f @ A.T, inverse is A.T @ F @ A — T.81 A.3.3 with the
# c(u)/2 normalization folded in.
_JPEG_DCT_A = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)] for u in range(8)])


class _JpegHuffTable:
    """Canonical Huffman table from a DHT (bits, values) spec: assign
    consecutive codes per length, shifting left between lengths."""

    def __init__(self, bits: list[int], values: list[int]):
        if sum(bits) != len(values):
            raise ValueError("DHT length counts do not match value count")
        self.lookup: dict[tuple[int, int], int] = {}
        self.encode: dict[int, tuple[int, int]] = {}
        code, vi = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    raise ValueError("over-subscribed Huffman code space")
                self.lookup[(length, code)] = values[vi]
                self.encode[values[vi]] = (length, code)
                code += 1
                vi += 1
            code <<= 1


class _JpegBitReader:
    """MSB-first bit reader over one de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff_decode(self, table: _JpegHuffTable) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the ``size``-bit magnitude to its signed
    value (leading 0 bit means negative)."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _jpeg_entropy_segments(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the scan's entropy data (FF 00 -> FF) and split it at
    restart markers (FF D0..D7). Any other marker ends the scan. Returns
    (segments, index of the terminating marker's FF) so a multi-scan
    caller can resume the marker walk there."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = payload[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _jpeg_seq_scan(segments: list[bytes], mapping, comps, blocks, huff,
                   restart_interval: int, mcus_x: int, mcus_y: int,
                   hmax: int, vmax: int, w_img: int, h_img: int) -> None:
    """Sequential (baseline) scan: DC+AC per block, restart-aware.
    A multi-component scan is interleaved — MCU order over the padded
    grid. A SINGLE-component scan is non-interleaved per T.81 A.2.2:
    MCU = one data unit, walked over the component's REAL block grid
    (exactly as the progressive DC/AC scans already do via
    _jpeg_comp_grid) — a gray baseline JPEG declaring 2x2 sampling
    factors codes ceil(w/8)*ceil(h/8) blocks, not 4 per 16x16 MCU."""
    if len(mapping) == 1:
        ci, dc_id, ac_id = mapping[0]
        nbx, nby = _jpeg_comp_grid(comps, ci, hmax, vmax, w_img, h_img)
        units = [((ci, dc_id, ac_id, blocks[ci][by, bx]),)
                 for by in range(nby) for bx in range(nbx)]
    else:
        units = []
        for mcu_i in range(mcus_x * mcus_y):
            my, mx = divmod(mcu_i, mcus_x)
            unit = []
            for ci, dc_id, ac_id in mapping:
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        unit.append((ci, dc_id, ac_id,
                                     blocks[ci][my * cv + by, mx * ch + bx]))
            units.append(tuple(unit))
    n_units = len(units)
    expected_segments = (
        -(-n_units // restart_interval) if restart_interval else 1)
    if len(segments) < expected_segments:
        raise ValueError("JPEG entropy stream missing restart segments")
    done = 0
    for seg_bytes in segments:
        if done >= n_units:
            break
        reader = _JpegBitReader(seg_bytes)
        pred = [0] * len(comps)                # DC predictors reset at RST
        seg_budget = restart_interval if restart_interval else n_units
        for _ in range(min(seg_budget, n_units - done)):
            for ci, dc_id, ac_id, z in units[done]:
                dc_tbl = huff.get((0, dc_id))
                ac_tbl = huff.get((1, ac_id))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("scan references undefined Huffman table")
                t = reader.huff_decode(dc_tbl)
                if t > 11:
                    raise ValueError("bad JPEG DC category")
                pred[ci] += _jpeg_extend(reader.receive(t), t)
                z[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.huff_decode(ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:             # ZRL: skip 16 zeros
                            k += 16
                            continue
                        break                   # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    z[k] = _jpeg_extend(reader.receive(s), s)
                    k += 1
            done += 1
    if done < n_units:
        raise ValueError("truncated JPEG entropy stream")


def _jpeg_comp_grid(comps, ci: int, hmax: int, vmax: int,
                    w_img: int, h_img: int) -> tuple[int, int]:
    """A component's REAL block grid (ceil of its scaled dimensions /
    8) — what a non-interleaved scan codes, excluding MCU padding."""
    _, ch, cv, _ = comps[ci]
    comp_w = -(-w_img * ch // hmax)
    comp_h = -(-h_img * cv // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _jpeg_prog_dc_scan(segments, mapping, comps, blocks, huff, ah, al,
                       restart_interval, mcus_x, mcus_y,
                       hmax, vmax, w_img, h_img) -> None:
    """Progressive DC scan (T.81 G.2): first pass (Ah=0) Huffman-codes
    DC differences shifted by Al; refinement passes append one raw bit
    per block. Interleaved scans walk MCUs over the padded grid;
    single-component scans walk the component's real block grid."""
    interleaved = len(mapping) > 1
    if interleaved:
        units = []                      # unit = list of blocks, MCU shape
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            unit = []
            for ci, dc_id, _ in mapping:
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        unit.append((ci, dc_id,
                                     blocks[ci][my * cv + by, mx * ch + bx]))
            units.append(unit)
    else:
        ci, dc_id, _ = mapping[0]
        nbx, nby = _jpeg_comp_grid(comps, ci, hmax, vmax, w_img, h_img)
        units = [[(ci, dc_id, blocks[ci][by, bx])]
                 for by in range(nby) for bx in range(nbx)]

    done = 0
    for seg_bytes in segments:
        if done >= len(units):
            break
        reader = _JpegBitReader(seg_bytes)
        pred = [0] * len(comps)
        budget = restart_interval if restart_interval else len(units)
        for _ in range(min(budget, len(units) - done)):
            for ci, dc_id, z in units[done]:
                if ah == 0:
                    dc_tbl = huff.get((0, dc_id))
                    if dc_tbl is None:
                        raise ValueError("scan references undefined Huffman table")
                    t = reader.huff_decode(dc_tbl)
                    if t > 11:
                        raise ValueError("bad JPEG DC category")
                    pred[ci] += _jpeg_extend(reader.receive(t), t)
                    z[0] = pred[ci] << al
                else:
                    z[0] = int(z[0]) | (reader.read_bit() << al)
            done += 1
    if done < len(units):
        raise ValueError("truncated JPEG entropy stream")


def _jpeg_prog_ac_scan(segments, mapping, comps, blocks, huff, ss, se, ah, al,
                       restart_interval, hmax, vmax, w_img, h_img) -> None:
    """Progressive AC scan (T.81 G.2, figure G.7 for refinement): always
    single-component, walking the real block grid. First pass (Ah=0)
    codes spectral band [Ss, Se] values shifted by Al with EOB-run
    symbols; refinement passes code newly-nonzero positions plus one
    correction bit per already-nonzero coefficient visited."""
    ci, _, ac_id = mapping[0]
    nbx, nby = _jpeg_comp_grid(comps, ci, hmax, vmax, w_img, h_img)
    blocks_ci = blocks[ci]
    order = [(by, bx) for by in range(nby) for bx in range(nbx)]
    n_units = len(order)
    ac_tbl = huff.get((1, ac_id))
    if ac_tbl is None:
        raise ValueError("scan references undefined Huffman table")
    p1, m1 = 1 << al, -1 << al

    done = 0
    for seg_bytes in segments:
        if done >= n_units:
            break
        reader = _JpegBitReader(seg_bytes)
        eobrun = 0
        budget = restart_interval if restart_interval else n_units
        for _ in range(min(budget, n_units - done)):
            by, bx = order[done]
            z = blocks_ci[by, bx]
            if ah == 0:                     # ---- first pass
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.huff_decode(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:     # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC run past band end")
                        z[k] = _jpeg_extend(reader.receive(s), s) << al
                        k += 1
            else:                           # ---- refinement (fig. G.7)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.huff_decode(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:     # EOBn: corrections then done
                                eobrun = (1 << r)
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            val = 0         # ZRL: pass 16 zero coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad refinement magnitude category")
                            val = p1 if reader.read_bit() else m1
                        while k <= se:
                            cur = int(z[k])
                            if cur != 0:
                                if reader.read_bit() and (cur & p1) == 0:
                                    z[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            z[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:          # correction-bit tail
                        cur = int(z[k])
                        if cur != 0:
                            if reader.read_bit() and (cur & p1) == 0:
                                z[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
            done += 1
    if done < n_units:
        raise ValueError("truncated JPEG entropy stream")


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> HxWx3 uint8 RGB: baseline/extended-sequential
    (SOF0/SOF1) and progressive (SOF2, spectral selection + successive
    approximation). Marker walk with per-scan Huffman entropy decode
    (restart-aware), then BULK numpy for the O(pixels) stages:
    dequantize + de-zigzag + IDCT run once over an (n_blocks, 8, 8)
    array per component, not per block."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _JpegHuffTable] = {}   # (class, id)
    frame = None            # (height, width, [(cid, h, v, tq), ...])
    progressive = False
    restart_interval = 0
    blocks = None
    layout = None           # (hmax, vmax, mcus_x, mcus_y)
    n_scans = 0
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:                      # fill byte (T.81 B.1.1.2):
            pos += 1                            # any number of 0xFF may pad
            continue                            # the space before a marker
        if marker == 0xD9:                      # EOI
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:   # bare markers
            pos += 2
            continue
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + length]
        if len(seg) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT (1+ tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables not supported")
                if off + 65 > len(seg):
                    raise ValueError("truncated DQT")
                qt[tq] = np.frombuffer(
                    seg[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:                    # DHT (1+ tables)
            off = 0
            while off + 17 <= len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _JpegHuffTable(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/SOF1/SOF2
            if frame is not None:
                raise ValueError("multiple JPEG frames not supported")
            progressive = marker == 0xC2
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported, got {prec}")
            if h_img == 0 or w_img == 0:
                raise ValueError("JPEG with deferred dimensions (DNL) not supported")
            _check_decode_pixels(w_img, h_img, "JPEG")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h_img, w_img, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
                raise ValueError("bad JPEG sampling factors")
            mcus_x = -(-w_img // (8 * hmax))
            mcus_y = -(-h_img // (8 * vmax))
            layout = (hmax, vmax, mcus_x, mcus_y)
            # Per-component zigzag coefficient store on the padded grid.
            blocks = [np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
                      for (_, ch, cv, _) in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "hierarchical/arithmetic/lossless JPEG not supported")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                    # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            h_img, w_img, comps = frame
            hmax, vmax, mcus_x, mcus_y = layout
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated JPEG scan header")
            mapping = []
            for s in range(ns):
                cs, tbls = seg[1 + 2 * s], seg[2 + 2 * s]
                idx = next((i for i, c in enumerate(comps) if c[0] == cs),
                           None)
                if idx is None:
                    raise ValueError(f"scan references unknown component {cs}")
                mapping.append((idx, tbls >> 4, tbls & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            segments, end = _jpeg_entropy_segments(payload, pos + 2 + length)
            if not progressive:
                if n_scans:
                    raise ValueError(
                        "multi-scan sequential JPEG not supported")
                if ns != len(comps) or (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("malformed baseline JPEG scan header")
                _jpeg_seq_scan(segments, mapping, comps, blocks, huff,
                               restart_interval, mcus_x, mcus_y,
                               hmax, vmax, w_img, h_img)
            elif ss == 0:                       # progressive DC scan
                if se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                _jpeg_prog_dc_scan(segments, mapping, comps, blocks, huff,
                                   ah, al, restart_interval, mcus_x, mcus_y,
                                   hmax, vmax, w_img, h_img)
            else:                               # progressive AC scan
                if len(mapping) != 1:
                    raise ValueError("interleaved progressive AC scan")
                if not 1 <= ss <= se <= 63:
                    raise ValueError("bad progressive spectral band")
                _jpeg_prog_ac_scan(segments, mapping, comps, blocks, huff,
                                   ss, se, ah, al, restart_interval,
                                   hmax, vmax, w_img, h_img)
            n_scans += 1
            pos = end
            continue
        pos += 2 + length
    if frame is None or n_scans == 0:
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps = frame
    hmax, vmax, _, _ = layout

    # Bulk per-component: dequantize -> de-zigzag -> IDCT -> +128 clip.
    planes = []
    a_mat = _JPEG_DCT_A
    for ci, (_, ch, cv, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        grid_h, grid_w, _ = blocks[ci].shape
        zz = blocks[ci].reshape(-1, 64).astype(np.float64) * \
            qt[tq][np.newaxis, :].astype(np.float64)
        coef = np.empty_like(zz)
        coef[:, _JPEG_ZIGZAG] = zz
        coef = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", a_mat, coef, a_mat,
                            optimize=True) + 128.0
        plane = (spatial.reshape(grid_h, grid_w, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(grid_h * 8, grid_w * 8))
        # Upsample to full resolution (integer ratios only — covers
        # 4:4:4 / 4:2:2 / 4:2:0 / 4:1:1).
        ry, rx = vmax // cv, hmax // ch
        if ry * cv != vmax or rx * ch != hmax:
            raise ValueError("non-integer JPEG chroma subsampling ratio")
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# Standard Annex K quantization tables (T.81 Tables K.1/K.2), row-major.
_JPEG_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_JPEG_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Encoder Huffman tables: FIXED-LENGTH canonical codes — every DC
# category at 4 bits (12 of 16 slots), every AC (run, size) symbol at 8
# bits (162 of 256 slots). Spec-valid (codes are canonical, the all-ones
# code is never assigned) and trivially correct; a production encoder
# would use frequency-optimal tables, which only changes SIZE. The
# decoder reads the tables from the DHT segment, so it exercises the
# same table-driven path real-world files use.
_JPEG_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_ENC_DC_VALS = list(range(12))
_JPEG_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_JPEG_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)]


class _JpegBitWriter:
    """MSB-first bit writer with FF 00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        """Pad with 1-bits to the next byte boundary (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _jpeg_quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def scaled(base: np.ndarray) -> np.ndarray:
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)
    return scaled(_JPEG_Q_LUMA), scaled(_JPEG_Q_CHROMA)


def _jpeg_fdct_quant_zigzag(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(grid_h*8, grid_w*8) float plane -> (grid_h, grid_w, 64) int32
    quantized zigzag coefficients — forward DCT, quantize and zigzag in
    bulk numpy."""
    gh, gw = plane.shape[0] // 8, plane.shape[1] // 8
    f = (plane.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
         .reshape(-1, 8, 8) - 128.0)
    a_mat = _JPEG_DCT_A
    coef = np.einsum("ux,nxy,vy->nuv", a_mat, f, a_mat, optimize=True)
    q = np.round(coef.reshape(-1, 64) / qtbl[np.newaxis, :]).astype(np.int32)
    return q[:, _JPEG_ZIGZAG].reshape(gh, gw, 64)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, size-bit magnitude code), T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _jpeg_encode_block(w: _JpegBitWriter, z: np.ndarray, pred: int,
                       dc_tbl: _JpegHuffTable, ac_tbl: _JpegHuffTable) -> int:
    """Huffman-encode one quantized zigzag block; returns the new DC
    predictor."""
    dc = int(z[0])
    size, bits = _jpeg_magnitude(dc - pred)
    length, code = dc_tbl.encode[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tbl.encode[0xF0]      # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        length, code = ac_tbl.encode[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if run:
        length, code = ac_tbl.encode[0x00]          # EOB
        w.write(code, length)
    return dc


def _jpeg_prog_ac_first_block(w: _JpegBitWriter, ac_tbl: _JpegHuffTable,
                              z: np.ndarray, ss: int, se: int, al: int) -> None:
    """Encode one block of a progressive first AC scan (Ah=0): band
    values point-transformed by Al, zero runs, EOB per block."""
    run = 0
    for k in range(ss, se + 1):
        t = int(z[k])
        at = abs(t) >> al
        if at == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tbl.encode[0xF0]
            w.write(code, length)
            run -= 16
        size, bits = _jpeg_magnitude(at if t > 0 else -at)
        length, code = ac_tbl.encode[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if run:
        length, code = ac_tbl.encode[0x00]          # EOB (run of 1)
        w.write(code, length)


def _jpeg_prog_ac_refine_block(w: _JpegBitWriter, ac_tbl: _JpegHuffTable,
                               z: np.ndarray, ss: int, se: int,
                               ah: int, al: int) -> None:
    """Encode one block of a progressive AC refinement scan (the exact
    inverse of figure G.7's decoder): newly-nonzero coefficients get a
    (run, 1) symbol + sign bit; already-nonzero coefficients visited
    along the way each contribute one buffered correction bit, emitted
    in POSITION order so the decoder's walk consumes them in place."""
    events: list = []                # "z" marker or a correction bit
    zeros = 0
    for k in range(ss, se + 1):
        t = int(z[k])
        at = abs(t)
        if (at >> al) == 0:          # still zero at this precision
            events.append("z")
            zeros += 1
        elif (at >> ah) != 0:        # already nonzero: correction bit
            events.append((at >> al) & 1)
        else:                        # newly nonzero (magnitude is 1)
            while zeros > 15:
                length, code = ac_tbl.encode[0xF0]    # ZRL
                w.write(code, length)
                zc = 0
                while zc < 16:       # bits interleaved among the 16 zeros
                    e = events.pop(0)
                    if e == "z":
                        zc += 1
                    else:
                        w.write(e, 1)
                zeros -= 16
            length, code = ac_tbl.encode[(zeros << 4) | 1]
            w.write(code, length)
            w.write(1 if t > 0 else 0, 1)             # sign
            for e in events:         # bits up to this position
                if e != "z":
                    w.write(e, 1)
            events.clear()
            zeros = 0
    if events:
        length, code = ac_tbl.encode[0x00]            # EOB (run of 1)
        w.write(code, length)
        for e in events:             # correction-bit tail
            if e != "z":
                w.write(e, 1)


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsample: str = "444",
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> JPEG bytes.

    Exists so the JPEG DECODE path is testable end-to-end with no binary
    fixtures and no PIL: a full spec-valid baseline encoder (single
    interleaved scan; ``subsample`` '444' or '420'; ``restart_interval``
    > 0 emits DRI + RSTn markers). ``progressive=True`` emits an SOF2
    file with the canonical successive-approximation script — DC first
    (Al=1) + DC refine, then per component AC 1-63 first (Al=1) + AC
    refine — exercising all four progressive scan kinds against the SAME
    quantized coefficients as the baseline mode, so the two decodes must
    agree exactly. Lossy by nature — tests assert round-trip closeness,
    plus exact decoder equality across entropy-layout variants."""
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    if progressive and restart_interval:
        raise ValueError("restart markers unsupported with progressive=True")
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected HxWx3 or HxW array, got shape {arr.shape}")
    h_img, w_img = arr.shape[:2]
    if h_img == 0 or w_img == 0:
        raise ValueError("cannot encode an empty image")
    q_luma, q_chroma = _jpeg_quality_tables(quality)
    dc_tbl = _JpegHuffTable(_JPEG_ENC_DC_BITS, _JPEG_ENC_DC_VALS)
    ac_tbl = _JpegHuffTable(_JPEG_ENC_AC_BITS, _JPEG_ENC_AC_VALS)

    sub = 2 if (subsample == "420" and not gray) else 1
    align = 8 * sub
    pad_h = -h_img % align
    pad_w = -w_img % align
    px = np.pad(arr.astype(np.float64),
                ((0, pad_h), (0, pad_w)) + (() if gray else ((0, 0),)),
                mode="edge")

    if gray:
        planes = [px]
        samplings = [(1, 1)]
        qtbls = [q_luma]
        qids = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub == 2:
            # 2x2 mean chroma downsample
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
        planes = [y, cb, cr]
        samplings = [(sub, sub), (1, 1), (1, 1)]
        qtbls = [q_luma, q_chroma, q_chroma]
        qids = [0, 1, 1]

    coeffs = [_jpeg_fdct_quant_zigzag(p, q) for p, q in zip(planes, qtbls)]

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"       # APP0
    # DQT (one segment per table)
    for tq, base in ([(0, q_luma)] if gray else [(0, q_luma), (1, q_chroma)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in base[_JPEG_ZIGZAG])
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h_img, w_img, ncomp)
    for ci, (ch, cv) in enumerate(samplings):
        sof += bytes([ci + 1, (ch << 4) | cv, qids[ci]])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: one DC + one AC table, shared by all components
    for tc, bits, vals in ((0, _JPEG_ENC_DC_BITS, _JPEG_ENC_DC_VALS),
                           (1, _JPEG_ENC_AC_BITS, _JPEG_ENC_AC_VALS)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    def emit_sos(comp_list, ss, se, ah, al):
        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([ci + 1, 0x00])               # DC 0 / AC 0
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def mcu_blocks():
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (ch, cv) in enumerate(samplings):
                for by in range(cv):
                    for bx in range(ch):
                        yield ci, coeffs[ci][my * cv + by, mx * ch + bx]

    if not progressive:
        out += emit_sos(list(range(ncomp)), 0, 63, 0, 0)
        writer = _JpegBitWriter()
        pred = [0] * ncomp
        rst = 0
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.byte_align()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            my, mx = divmod(mcu, mcus_x)
            for ci, (ch, cv) in enumerate(samplings):
                for by in range(cv):
                    for bx in range(ch):
                        z = coeffs[ci][my * cv + by, mx * ch + bx]
                        pred[ci] = _jpeg_encode_block(
                            writer, z, pred[ci], dc_tbl, ac_tbl)
        writer.byte_align()
        out += writer.out
        out += b"\xff\xd9"                             # EOI
        return bytes(out)

    # Progressive script: DC first (Al=1) -> DC refine -> per-component
    # AC first (Al=1) -> per-component AC refine.
    out += emit_sos(list(range(ncomp)), 0, 0, 0, 1)
    writer = _JpegBitWriter()
    pred = [0] * ncomp
    for ci, z in mcu_blocks():
        v = int(z[0]) >> 1                             # DC point transform
        size, bits = _jpeg_magnitude(v - pred[ci])
        pred[ci] = v
        length, code = dc_tbl.encode[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
    writer.byte_align()
    out += writer.out

    out += emit_sos(list(range(ncomp)), 0, 0, 1, 0)
    writer = _JpegBitWriter()
    for ci, z in mcu_blocks():
        writer.write(int(z[0]) & 1, 1)                 # DC refinement bit
    writer.byte_align()
    out += writer.out

    # the decoder's real-block-grid function, fed encoder-shaped tuples —
    # one definition, so the two sides cannot disagree on AC scan extents
    comps_like = [(ci + 1, ch, cv, 0)
                  for ci, (ch, cv) in enumerate(samplings)]

    def comp_grid(ci):
        return _jpeg_comp_grid(comps_like, ci, hmax, vmax, w_img, h_img)

    for ah, al in ((0, 1), (1, 0)):
        for ci in range(ncomp):
            out += emit_sos([ci], 1, 63, ah, al)
            writer = _JpegBitWriter()
            nbx, nby = comp_grid(ci)
            for by in range(nby):
                for bx in range(nbx):
                    z = coeffs[ci][by, bx]
                    if ah == 0:
                        _jpeg_prog_ac_first_block(writer, ac_tbl, z, 1, 63, al)
                    else:
                        _jpeg_prog_ac_refine_block(
                            writer, ac_tbl, z, 1, 63, ah, al)
            writer.byte_align()
            out += writer.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Motion-JPEG in AVI — the video container that is fully decodable with
# the layers above: RIFF parsing (shared shape with WAV) + per-frame
# baseline JPEG. Makes the VIDEO modality real end-to-end: true frame
# counts for frame_sample_plan, true pixels for frame extraction.
# --------------------------------------------------------------------------


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, list_type|None, body_start, body_end) for each RIFF
    chunk in data[start:end]; LIST/RIFF chunks carry their list type and
    their body EXCLUDES the 4-byte type tag."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start, body_end = pos + 8, pos + 8 + size
        if body_end > end:
            raise ValueError(f"truncated RIFF chunk {fourcc!r}")
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, data[body_start : body_start + 4], body_start + 4, body_end
        else:
            yield fourcc, None, body_start, body_end
        pos = body_end + (size & 1)          # chunks are word-aligned


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Motion-JPEG AVI bytes -> (width, height, [jpeg frame bytes, ...]).

    Walks the RIFF tree: ``avih`` gives the declared dimensions, the
    ``movi`` list carries one compressed chunk per frame (``..dc``/
    ``..db``, including frames nested in ``rec `` lists). The frame
    PAYLOADS are returned still JPEG-encoded — frame decode is the
    caller's per-frame choice (decode_image), so sampling every Nth
    frame never pays for the frames it skips. Non-MJPEG codecs raise
    ValueError (the quarantine path)."""
    if sniff_format(payload) != "avi":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    compression = None
    stream_type = None                    # fccType of the LAST strh seen
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, compression, stream_type
        for fourcc, ltype, b0, b1 in _riff_chunks(payload, start, end):
            if ltype is not None:
                walk(b0, b1)
            elif fourcc == b"avih" and b1 - b0 >= 40:
                width = struct.unpack_from("<I", payload, b0 + 32)[0]
                height = struct.unpack_from("<I", payload, b0 + 36)[0]
            elif fourcc == b"strh" and b1 - b0 >= 4:
                stream_type = payload[b0 : b0 + 4]
            elif fourcc == b"strf" and b1 - b0 >= 20 \
                    and stream_type == b"vids" and compression is None:
                # BITMAPINFOHEADER.biCompression of the VIDEO stream —
                # keyed off the preceding strh's fccType, so an AVI that
                # lists its audio stream first is not misread (an audio
                # strf's bytes 16:20 are not a codec fourcc)
                compression = payload[b0 + 16 : b0 + 20]
            elif len(fourcc) == 4 and fourcc[2:] in (b"dc", b"db"):
                frames.append(payload[b0:b1])

    walk(12, len(payload))
    if compression is not None and compression.upper() not in (b"MJPG", b"JPEG"):
        raise ValueError(
            f"AVI codec {compression!r} not supported (MJPG only)")
    if width is None or not frames:
        raise ValueError("AVI missing avih header or movi frames")
    if width <= 0 or height <= 0:
        # some muxers leave avih dims unset and rely on strf/biWidth —
        # fall back to the first frame's real dimensions
        first = _decode_jpeg(frames[0])
        height, width = first.shape[:2]
    return int(width), int(height), frames


def avi_frame_period_usec(payload: bytes) -> int | None:
    """Read ``avih.dwMicroSecPerFrame`` (the declared frame period) from
    an AVI header, or None when absent/zero. Header-only walk: recurses
    into LIST bodies but returns at the first ``avih`` — never touches
    the movi data, so it is O(header bytes) regardless of video size."""
    if sniff_format(payload) != "avi":
        raise ValueError("not a RIFF/AVI payload")

    def walk(start: int, end: int) -> int | None:
        for fourcc, ltype, b0, b1 in _riff_chunks(payload, start, end):
            if fourcc == b"avih" and b1 - b0 >= 4:
                return struct.unpack_from("<I", payload, b0)[0]
            if ltype == b"movi":
                continue
            if ltype is not None:
                found = walk(b0, b1)
                if found is not None:
                    return found
        return None

    usec = walk(12, len(payload))
    return usec if usec else None


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """List of HxWx3 uint8 frames -> Motion-JPEG AVI bytes (test harness
    for the video decode path, exactly like encode_jpeg for images)."""
    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one size")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), 0, 0, 0x10, len(jpegs), 0, 1,
        max(len(j) for j in jpegs), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIiI", 0, 0, 0, 0, 1, max(fps, 1), 0, len(jpegs),
        max(len(j) for j in jpegs), -1, 0)
        + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return b"RIFF" + struct.pack(
        "<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


# --------------------------------------------------------------------------
# GIF (87a/89a) — decoder + test encoder. The palette+LZW image family:
# covers the animated-image modality (true frame counts and composited
# pixels) that PNG/JPEG/AVI do not. LZW decode is inherently code-serial
# per frame (like the JPEG Huffman walk); the palette scatter and frame
# compositing are bulk numpy.
# --------------------------------------------------------------------------

# GIF interlace passes: (row start, row step) in spec order.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_rows(h: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order — the single
    definition both the decoder's de-interlace scatter and the test
    encoder's row reorder share."""
    return np.concatenate([np.arange(s, h, t) for s, t in _GIF_INTERLACE])


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: little-endian bit packing, variable code width
    growing 3..12 bits, CLEAR resets the table, EOI ends the stream.
    Returns exactly ``n_pixels`` palette indices (uint8)."""
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # table as parent-pointer arrays: code -> (prefix code, final byte,
    # first byte) — O(1) append, no per-entry byte-string building
    max_codes = 1 << 12
    prefix = np.full(max_codes, -1, dtype=np.int32)
    final = np.zeros(max_codes, dtype=np.uint8)
    first = np.zeros(max_codes, dtype=np.uint8)
    for c in range(clear):
        final[c] = first[c] = c

    def expand(code: int) -> bytes:
        chain = bytearray()
        while code >= 0:
            chain.append(int(final[code]))
            code = int(prefix[code]) if code >= clear else -1
        chain.reverse()
        return bytes(chain)

    next_code = eoi + 1
    width = min_code_size + 1
    acc = bits = pos = 0
    prev = -1
    n = len(data)
    while n_out < n_pixels:
        while bits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:                      # first code after a clear
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:              # known code
            seq = expand(code)
            head = first[code]
        elif code == next_code:           # the KwK special case
            head = first[prev]
            seq = expand(prev) + bytes([head])
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        take = min(len(seq), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(seq[:take], dtype=np.uint8)
        n_out += take
        if next_code < max_codes:
            prefix[next_code] = prev
            final[next_code] = head
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError(f"GIF frame short {n_out} < {n_pixels} pixels")
    return out


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at pos; returns
    (data, position after the 0x00 terminator)."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        parts.append(payload[pos : pos + size])
        pos += size


def decode_gif(payload: bytes,
               max_frames: int | None = None) -> tuple[int, int, list[np.ndarray]]:
    """GIF87a/89a bytes -> (width, height, [HxWx3 uint8 frames, ...]).

    Full animation semantics: frames are COMPOSITED onto the logical
    screen in order — sub-rectangle placement, transparent-index
    skip, and disposal methods 0/1 (leave), 2 (restore background,
    which renders as transparent-black per every modern viewer) and
    3 (restore previous). Interlaced frames are de-interlaced.
    ``max_frames`` stops after that many composited frames, so the
    still-image view (decode_image takes frame 0) pays O(first frame),
    not O(whole animation). Malformed streams raise ValueError (the
    quarantine path)."""
    if sniff_format(payload) != "gif":
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    _check_decode_pixels(w, h, "GIF")
    flags = payload[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload[pos : pos + 3 * size], dtype=np.uint8).reshape(-1, 3)
        if global_pal.shape[0] < size:
            raise ValueError("truncated GIF global color table")
        pos += 3 * size

    frames: list[np.ndarray] = []
    # RGBA canvas: alpha distinguishes never-painted / disposed-to-
    # background pixels (rendered as black in the returned RGB)
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    transparent = -1
    disposal = 0
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:                 # trailer
            break
        if block == 0x21:                 # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _gif_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:   # graphic control
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, lflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw <= 0 or fh <= 0 or left + fw > w or top + fh > h:
            raise ValueError("GIF frame rectangle outside the logical screen")
        pal = global_pal
        if lflags & 0x80:
            size = 2 << (lflags & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * size], dtype=np.uint8).reshape(-1, 3)
            if pal.shape[0] < size:
                raise ValueError("truncated GIF local color table")
            pos += 3 * size
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        lzw, pos = _gif_subblocks(payload, pos + 1)
        idx = _gif_lzw_decode(min_code, lzw, fw * fh).reshape(fh, fw)
        if lflags & 0x40:                 # de-interlace
            deint = np.empty_like(idx)
            deint[_gif_interlace_rows(fh)] = idx
            idx = deint
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF palette index out of range")
        saved = canvas[top : top + fh, left : left + fw].copy()
        rgba = np.concatenate(
            [pal[idx], np.full((fh, fw, 1), 255, dtype=np.uint8)], axis=2)
        if transparent >= 0:
            keep = idx == transparent
            rgba[keep] = canvas[top : top + fh, left : left + fw][keep]
        canvas[top : top + fh, left : left + fw] = rgba
        frames.append(canvas[:, :, :3].copy())
        if max_frames is not None and len(frames) >= max_frames:
            return int(w), int(h), frames
        if disposal == 2:                 # restore background = clear
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3:               # restore previous
            canvas[top : top + fh, left : left + fw] = saved
        disposal = 0
        transparent = -1
    if not frames:
        raise ValueError("GIF contains no image frames")
    return int(w), int(h), frames


def _gif_lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """GIF-variant LZW encoder (dict-based, emits CLEAR on table
    overflow) — the inverse of _gif_lzw_decode, for the test harness."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur = b""
    for v in indices.tolist():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        # pre-increment width growth: the decoder's table trails the
        # encoder's by one entry (the KwK lag), so the encoder widens on
        # ASSIGNING code 2^width while the decoder widens on REACHING
        # next_code == 2^width — both sides then switch between the same
        # two emitted codes
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > (1 << 12) - 1:
            emit(clear)
            table = {bytes([c]): c for c in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], interlace: bool = False,
               delay_cs: int = 0) -> bytes:
    """List of HxWx3 uint8 frames -> animated GIF bytes (test harness for
    the decode path). Builds one global palette from the distinct colors
    across all frames — lossless round-trip; >256 distinct colors raise
    (quantization is a decoder test concern, not an encoder feature)."""
    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all GIF frames must share one size")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if colors.shape[0] > 256:
        raise ValueError(f"{colors.shape[0]} distinct colors exceed a GIF palette")
    pal_bits = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    lut = {tuple(c): i for i, c in enumerate(colors.tolist())}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    min_code = max(2, pal_bits)
    for f in frames:
        idx = np.array([lut[tuple(p)] for p in f.reshape(-1, 3).tolist()],
                       dtype=np.uint8).reshape(h, w)
        if interlace:
            idx = idx[_gif_interlace_rows(h)]
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) \
            + b"\x00\x00"                               # GCE: no disposal
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        out.append(min_code)
        lzw = _gif_lzw_encode(min_code, idx.reshape(-1))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# --------------------------------------------------------------------------
# TIFF — the scan-corpus format: IFD walk in either byte order, strip
# assembly, 8-bit gray/RGB(A); uncompressed, LZW and PackBits strips
# (with the horizontal predictor). Other compressions (JPEG-in-TIFF,
# Deflate) raise ValueError — the quarantine path, like every other
# unsupported shape.
# --------------------------------------------------------------------------

# TIFF tag ids the baseline reader needs
_TIFF_TAGS = {256: "width", 257: "height", 258: "bits", 259: "compression",
              262: "photometric", 273: "strip_offsets", 277: "spp",
              278: "rows_per_strip", 279: "strip_counts", 284: "planar",
              317: "predictor"}
# field type -> byte size (only the types baseline IFDs use)
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def _tiff_values(payload: bytes, bo: str, ftype: int, count: int,
                 raw: bytes) -> list[int]:
    if ftype not in _TIFF_TYPE_SIZE:
        raise ValueError(f"unsupported TIFF field type {ftype}")
    size = _TIFF_TYPE_SIZE[ftype] * count
    if size > 4:                          # value is an offset to the data
        off = struct.unpack(bo + "I", raw)[0]
        data = payload[off : off + size]
        if len(data) < size:
            raise ValueError("truncated TIFF value block")
    else:
        data = raw[:size]
    fmt = {1: "B", 3: "H", 4: "I"}[ftype]
    return list(struct.unpack(bo + fmt * count, data))


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, byte
    literals 0-255, CLEAR=256, EOI=257, and the EARLY-CHANGE rule —
    the code width grows when the NEXT code to assign is 2^width - 1
    (one code earlier than GIF). Returns at most ``max_out`` bytes."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    width = 9
    next_code = 258
    reset()
    acc = bits = pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < max_out:
        while bits < width:
            if pos >= n:
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            bits += 8
            pos += 1
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW stream starts with a non-literal")
            seq = table[code]
        elif code < next_code:
            seq = table[code]
        elif code == next_code:              # KwK
            seq = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += seq
        if prev is not None and next_code < 4096:
            table.append(prev + seq[:1])
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
        prev = seq
    return bytes(out[:max_out])


def _tiff_packbits_decode(data: bytes, max_out: int) -> bytes:
    """PackBits (Apple RLE, TIFF compression 32773): n in 0..127 copies
    n+1 literal bytes; n in -127..-1 repeats the next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_out:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out[:max_out])


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes -> HxWx3 uint8 RGB. Little- or big-endian,
    first IFD only, 8-bit samples, chunky planar config; strips may be
    uncompressed, LZW (with horizontal-differencing predictor) or
    PackBits; gray expands to RGB, an alpha sample is dropped. Other
    compressions / tiled / sub-byte TIFFs raise ValueError (the
    quarantine path)."""
    if sniff_format(payload) != "tiff":
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    ifd_off = struct.unpack(bo + "I", payload[4:8])[0]
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    n_entries = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])[0]
    tags: dict[str, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tag, ftype, count = struct.unpack(bo + "HHI", payload[e : e + 8])
        name = _TIFF_TAGS.get(tag)
        if name:
            tags[name] = _tiff_values(payload, bo, ftype, count,
                                      payload[e + 8 : e + 12])

    def one(name, default=None):
        v = tags.get(name)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {name}")
            return default
        return v[0]

    w, h = one("width"), one("height")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    _check_decode_pixels(w, h, "TIFF")
    compression = one("compression", 1)
    if compression not in (1, 5, 32773):
        raise ValueError(f"TIFF compression {compression} not supported "
                         "(uncompressed, LZW, PackBits only)")
    predictor = one("predictor", 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    if one("planar", 1) != 1:
        raise ValueError("planar TIFF not supported (chunky only)")
    spp = one("spp", 1)
    bits = tags.get("bits", [8] * spp)
    if spp not in (1, 3, 4) or any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit gray/RGB(A) TIFF supported "
                         f"(spp={spp}, bits={bits})")
    offsets = tags.get("strip_offsets")
    counts = tags.get("strip_counts")
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout tags")
    rps = one("rows_per_strip", h)
    parts = []
    for i, (o, c) in enumerate(zip(offsets, counts)):
        raw = payload[o : o + c]
        if len(raw) < c:
            raise ValueError("truncated TIFF strip")
        rows = min(rps, h - i * rps)
        strip_bytes = rows * w * spp
        if compression == 5:
            parts.append(_tiff_lzw_decode(raw, strip_bytes))
        elif compression == 32773:
            parts.append(_tiff_packbits_decode(raw, strip_bytes))
        else:
            parts.append(raw[:strip_bytes])
    raster = b"".join(parts)
    need = w * h * spp
    if len(raster) < need:
        raise ValueError(f"truncated TIFF raster: {len(raster)} < {need}")
    px = np.frombuffer(raster[:need], dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: each sample stored as delta from the
        # same sample one pixel left — undo with a per-row cumsum
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if one("photometric", 1) == 0:        # WhiteIsZero: invert gray
        px = 255 - px
    if spp == 1:
        return np.repeat(px, 3, axis=2).copy()
    return px[:, :, :3].copy()


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first, early change) — the inverse
    of _tiff_lzw_decode, for the test harness."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = bits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
        acc &= (1 << bits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(clear)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        # early change: the encoder widens on ASSIGNING code 2^w - 1
        # (one entry before the decoder REACHES next_code == 2^w - 1 —
        # same one-entry lag as the GIF pair, shifted by the TIFF rule)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        next_code += 1
        if next_code >= 4094:              # spec: clear before the cap
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(eoi)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _tiff_packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: repeat runs for >= 2 equal bytes, literal runs
    otherwise (both capped at 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        start = i
        i += 1
        while (i < n and i - start < 128
               and not (i + 1 < n and data[i] == data[i + 1])):
            i += 1
        out.append(i - start - 1)
        out += data[start:i]
    return bytes(out)


def encode_tiff(arr: np.ndarray, big_endian: bool = False,
                rows_per_strip: int = 4, compression: str = "none",
                predictor: int = 1) -> bytes:
    """HxWx3 or HxW uint8 -> baseline TIFF bytes (test harness for the
    decode path; emits multiple strips so strip assembly is exercised).
    ``compression``: 'none' | 'lzw' | 'packbits'; ``predictor=2``
    applies horizontal differencing (LZW's usual companion)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected HxWx3 or HxW array, got shape {a.shape}")
    if compression not in ("none", "lzw", "packbits"):
        raise ValueError(f"unknown TIFF compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unknown TIFF predictor {predictor}")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    bo = ">" if big_endian else "<"
    if predictor == 2:
        # horizontal differencing per row/sample, mod 256
        px3 = a.reshape(h, w, spp).astype(np.int64)
        diff = np.empty_like(px3)
        diff[:, 0] = px3[:, 0]
        diff[:, 1:] = px3[:, 1:] - px3[:, :-1]
        flat = (diff & 0xFF).astype(np.uint8).reshape(h, w * spp)
    else:
        flat = a.reshape(h, w * spp)
    pack = {"none": bytes, "lzw": _tiff_lzw_encode,
            "packbits": _tiff_packbits_encode}[compression]
    strips = [pack(flat[y : y + rows_per_strip].tobytes())
              for y in range(0, h, rows_per_strip)]
    n = len(strips)

    comp_code = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    extra = bytearray()                   # out-of-line value blocks
    header_len = 8
    ifd_len = 2 + 12 * 11 + 4

    def defer(fmt_char, values):
        # returns a 4-byte field once offsets are known; collect later
        return (fmt_char, list(values))

    # strip data goes after header + IFD + extra blocks; compute in two
    # passes: first lay out extra blocks, then strip offsets
    bits_val = defer("H", [8] * spp) if spp > 1 else ("inline", [8])
    offs_val = defer("I", [0] * n) if n > 1 else ("inline", [0])
    cnts_val = defer("I", [len(s) for s in strips]) if n > 1 \
        else ("inline", [len(strips[0])])

    def block_size(v):
        fmt_char, values = v
        if fmt_char == "inline":
            return 0
        return struct.calcsize(bo + fmt_char * len(values))

    extra_off = header_len + ifd_len
    blocks = {}
    for key, v in (("bits", bits_val), ("offs", offs_val), ("cnts", cnts_val)):
        sz = block_size(v)
        if sz:
            blocks[key] = extra_off + len(extra)
            extra += b"\x00" * sz
    data_off = extra_off + len(extra)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    offs_val = (offs_val[0], strip_offsets if n > 1 else [strip_offsets[0]])

    def entry(tag, ftype, count, value):
        return struct.pack(bo + "HHI", tag, ftype, count) + value

    def inline(ftype_char, v):
        raw = struct.pack(bo + ftype_char, v)
        return raw + b"\x00" * (4 - len(raw))

    ifd = [
        entry(256, 4, 1, inline("I", w)),
        entry(257, 4, 1, inline("I", h)),
        entry(258, 3, spp, inline("H", 8) if spp == 1
              else struct.pack(bo + "I", blocks["bits"])),
        entry(259, 3, 1, inline("H", comp_code)),
        entry(262, 3, 1, inline("H", 1 if gray else 2)),  # BlackIsZero/RGB
        entry(273, 4, n, inline("I", strip_offsets[0]) if n == 1
              else struct.pack(bo + "I", blocks["offs"])),
        entry(277, 3, 1, inline("H", spp)),
        entry(278, 4, 1, inline("I", rows_per_strip)),
        entry(279, 4, n, inline("I", len(strips[0])) if n == 1
              else struct.pack(bo + "I", blocks["cnts"])),
        entry(284, 3, 1, inline("H", 1)),                 # chunky
        entry(317, 3, 1, inline("H", predictor)),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(ifd)) + b"".join(ifd)
    out += struct.pack(bo + "I", 0)                       # next-IFD = none
    out += extra
    # fill the deferred blocks now that out holds them
    if "bits" in blocks:
        struct.pack_into(bo + "H" * spp, out, blocks["bits"], *([8] * spp))
    if "offs" in blocks:
        struct.pack_into(bo + "I" * n, out, blocks["offs"], *strip_offsets)
    if "cnts" in blocks:
        struct.pack_into(bo + "I" * n, out, blocks["cnts"],
                         *[len(s) for s in strips])
    for s in strips:
        out += s
    return bytes(out)


# --------------------------------------------------------------------------
# MP3 / MP4 container parsing — metadata only. The sample data inside
# (MPEG audio granules, H.264/AAC access units) is codec-compressed
# beyond a stdlib+numpy implementation, so operators/multimodal.py
# routes these sniffs to quarantine-WITH-metadata rows (feature NULL,
# container metadata real): duration, track dimensions, sample/frame
# counts and codec fourccs are parsed for real from the container
# structure by parse_mp3/parse_mp4 below; pixels/samples are not faked.
# Malformed containers raise ValueError — the plain-quarantine path.
# --------------------------------------------------------------------------

# bitrate (kbps) by [version-group][layer][index 1..14]; group 0 = MPEG1,
# group 1 = MPEG2/2.5 (ISO 11172-3 / 13818-3 tables)
_MP3_BITRATE_KBPS = {
    (0, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rate (Hz) by version bits (00=2.5, 10=2, 11=1) and rate index
_MP3_RATES = {
    3: (44100, 48000, 32000),    # MPEG1
    2: (22050, 24000, 16000),    # MPEG2
    0: (11025, 12000, 8000),     # MPEG2.5
}


def _mp3_frame_header(payload: bytes, i: int):
    """Validate and size one MPEG audio frame header at offset ``i``.
    Returns (frame_len, samples_per_frame, sample_rate, channels,
    bitrate_kbps) or None if any field is invalid. Free-format frames
    (bitrate index 0) return None — their length is not derivable from
    the header."""
    if i + 4 > len(payload):
        return None
    b1, b2, b3 = payload[i], payload[i + 1], payload[i + 2]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version = (b2 >> 3) & 0x03          # 00=2.5  01=reserved  10=2  11=1
    layer_bits = (b2 >> 1) & 0x03       # 00=reserved 01=III 10=II 11=I
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits              # 1, 2 or 3
    br_idx = (b3 >> 4) & 0x0F
    sr_idx = (b3 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    group = 0 if version == 3 else 1
    bitrate = _MP3_BITRATE_KBPS[(group, layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (b3 >> 1) & 0x01
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or group == 0) else 576
        frame_len = samples // 8 * bitrate // rate + padding
    channels = 1 if (payload[i + 3] >> 6) == 3 else 2
    return frame_len, samples, rate, channels, bitrate // 1000


def parse_mp3(payload: bytes) -> dict:
    """MPEG audio (MP3) container metadata by frame-header scanning: skip
    a leading ID3v2 tag (syncsafe size), then walk contiguous frame
    headers, each sized from its bitrate/sample-rate/padding fields.
    Returns {sample_rate, channels, n_frames, duration_sec,
    bitrate_kbps} — bitrate_kbps is the mean over frames (VBR streams
    vary per frame). Trailing ID3v1 ('TAG', 128 bytes) and post-stream
    junk end the scan; zero valid frames raise ValueError (the
    quarantine path)."""
    if payload is None or len(payload) < 4:
        raise ValueError("not an MP3 payload")
    payload = bytes(payload)
    i = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        s = payload[6:10]
        if any(b >= 0x80 for b in s):
            raise ValueError("malformed ID3v2 syncsafe size")
        i = 10 + ((s[0] << 21) | (s[1] << 14) | (s[2] << 7) | s[3])
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: the 10-byte footer is NOT included in
            # the syncsafe size (ID3v2.4.0 §3.1) — skip it too, or the
            # frame scan starts inside the footer and a valid file
            # spuriously quarantines
            i += 10
    n_frames = 0
    total_samples = 0
    kbps_sum = 0
    rate = channels = None
    while i + 4 <= len(payload):
        hdr = _mp3_frame_header(payload, i)
        if hdr is None:
            break
        frame_len, samples, r, ch, kbps = hdr
        if rate is None:
            rate, channels = r, ch
        n_frames += 1
        total_samples += samples
        kbps_sum += kbps
        i += frame_len
    if n_frames == 0:
        raise ValueError("no valid MPEG audio frame found")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_sec": total_samples / rate,
        "bitrate_kbps": kbps_sum / n_frames,
    }


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the ISO-BMFF boxes in
    data[start:end]. Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0) boxes; a box overrunning its container
    raises ValueError."""
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", data, i)[0]
        fourcc = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            size = struct.unpack_from(">Q", data, i + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(f"mp4: box {fourcc!r} overruns its container")
        yield fourcc, i + hdr, i + size
        i += size


def _mp4_child(data: bytes, start: int, end: int, fourcc: bytes):
    for f, b, e in _mp4_boxes(data, start, end):
        if f == fourcc:
            return b, e
    return None


def _mp4_read(fmt: str, data: bytes, off: int, end: int, what: str) -> int:
    """Bounds-checked big-endian field read inside a box body ending at
    ``end``. Overruns raise ValueError — not IndexError/struct.error —
    so ``except ValueError`` quarantine callers behave as documented."""
    size = struct.calcsize(fmt)
    if off < 0 or off + size > end:
        raise ValueError(f"mp4: truncated {what}")
    return struct.unpack_from(fmt, data, off)[0]


def parse_mp4(payload: bytes) -> dict:
    """ISO-BMFF (MP4/MOV/M4A) metadata: box walk to moov/mvhd for the
    movie timescale+duration, and per trak: tkhd display dimensions
    (16.16 fixed point), mdia/hdlr handler type ('vide'/'soun'),
    mdia/minf/stbl/stsd first sample-entry fourcc (the codec), and
    stbl/stsz sample count. Returns {brand, duration_sec, n_tracks,
    tracks: [{handler, codec, width, height, n_samples}]}. A payload
    without a moov box (streaming-fragmented without an initialization
    segment) raises ValueError — the quarantine path."""
    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    payload = bytes(payload)
    brand = payload[8:12].decode("latin-1")
    moov = _mp4_child(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box (fragmented or truncated)")
    mb, me = moov
    duration_sec = None
    mvhd = _mp4_child(payload, mb, me, b"mvhd")
    if mvhd is not None:
        vb, ve = mvhd
        version = _mp4_read(">B", payload, vb, ve, "mvhd version")
        if version == 1:
            timescale = _mp4_read(">I", payload, vb + 20, ve, "mvhd v1")
            duration = _mp4_read(">Q", payload, vb + 24, ve, "mvhd v1")
        else:
            timescale = _mp4_read(">I", payload, vb + 12, ve, "mvhd v0")
            duration = _mp4_read(">I", payload, vb + 16, ve, "mvhd v0")
        if timescale:
            duration_sec = duration / timescale
    tracks = []
    for f, tb, te in _mp4_boxes(payload, mb, me):
        if f != b"trak":
            continue
        track = {"handler": None, "codec": None, "width": None,
                 "height": None, "n_samples": None}
        tkhd = _mp4_child(payload, tb, te, b"tkhd")
        if tkhd is not None:
            kb, ke = tkhd
            if ke - kb < 8:
                raise ValueError("mp4: truncated tkhd")
            w = _mp4_read(">I", payload, ke - 8, ke, "tkhd") >> 16
            h = _mp4_read(">I", payload, ke - 4, ke, "tkhd") >> 16
            track["width"], track["height"] = (w or None), (h or None)
        mdia = _mp4_child(payload, tb, te, b"mdia")
        if mdia is not None:
            db, de = mdia
            hdlr = _mp4_child(payload, db, de, b"hdlr")
            if hdlr is not None:
                hb, he = hdlr
                if hb + 12 > he:
                    raise ValueError("mp4: truncated hdlr")
                track["handler"] = payload[hb + 8 : hb + 12].decode("latin-1")
            minf = _mp4_child(payload, db, de, b"minf")
            if minf is not None:
                stbl = _mp4_child(payload, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    sb, se = stbl
                    stsd = _mp4_child(payload, sb, se, b"stsd")
                    if stsd is not None:
                        eb, ee = stsd
                        if _mp4_read(">I", payload, eb + 4, ee,
                                     "stsd") >= 1 and eb + 16 <= ee:
                            track["codec"] = payload[eb + 12 : eb + 16] \
                                .decode("latin-1")
                    stsz = _mp4_child(payload, sb, se, b"stsz")
                    if stsz is not None:
                        zb, ze = stsz
                        track["n_samples"] = _mp4_read(
                            ">I", payload, zb + 8, ze, "stsz")
        tracks.append(track)
    return {"brand": brand, "duration_sec": duration_sec,
            "n_tracks": len(tracks), "tracks": tracks}


def gif_scan(payload: bytes) -> tuple[int, float | None]:
    """Walk a GIF's image-descriptor / extension / sub-block structure
    once — no LZW decode, no compositing — returning ``(n_frames,
    duration_sec)``. Duration is the sum of Graphic Control Extension
    delay fields (GIF89a §23, centiseconds, little-endian) and ``None``
    when no GCE carries a delay (a static GIF has no duration). Same
    O(bytes) cost as counting alone; parity with full decode_gif pinned
    in tests/test_codecs_gif.py."""
    if sniff_format(payload) != "gif":
        raise ValueError("not a GIF payload")
    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    count = 0
    delay_cs = 0
    saw_delay = False
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension: label + subblocks
            label = payload[pos] if pos < n else None
            pos += 1
            body, pos = _gif_subblocks(payload, pos)
            # GCE: packed(1) delay_lo delay_hi transparent_idx
            if label == 0xF9 and len(body) >= 3:
                delay_cs += body[1] | (body[2] << 8)
                saw_delay = True
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        lflags = payload[pos + 8]
        pos += 9
        if lflags & 0x80:                       # local color table
            pos += 3 * (2 << (lflags & 0x07))
        pos += 1                                # LZW minimum code size
        _, pos = _gif_subblocks(payload, pos)
        count += 1
    return count, (delay_cs / 100.0 if saw_delay else None)


def gif_frame_count(payload: bytes) -> int:
    """Frame count by the O(bytes) structure walk (see gif_scan)."""
    return gif_scan(payload)[0]
