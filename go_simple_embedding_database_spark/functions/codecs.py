"""Pure-python/numpy media codecs for the multimodal operators.

The container ships no PIL/ffmpeg/torchaudio, so the codec layer is
self-contained: real decoders for the container formats implementable
with the stdlib + numpy alone — binary PPM/PGM (netpbm P6/P5), 24/32-bit
uncompressed BMP, PCM WAV, and non-interlaced 8-bit PNG (DEFLATE is
stdlib ``zlib``; the scanline unfiltering is implemented here). Formats
whose entropy coding has no stdlib implementation (JPEG/MP3/MP4) still
fall back to the clearly-marked deterministic fake in
``operators.multimodal``, keeping every downstream operator exercisable
on arbitrary bytes.

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
    "resize_nearest",
    "decode_wav",
    "image_feature",
    "audio_feature",
]

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


# Known DIB header sizes (BITMAPCOREHEADER excluded — 24-bit core BMPs
# are extinct; decode_image requires >= 40 anyway).
_BMP_DIB_SIZES = frozenset({40, 52, 56, 108, 124})


def sniff_format(payload: bytes) -> str | None:
    """Container format sniff: 'ppm' | 'pgm' | 'bmp' | 'wav' | 'png', or
    None for anything this codec layer cannot really decode.

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
    if payload[:8] == _PNG_SIGNATURE:
        # the 8-byte signature includes non-ASCII and CR/LF bytes by
        # design (it cannot occur in text), so no extra strictness needed
        return "png"
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
    PGM (P5, expanded to RGB), and uncompressed 24/32-bit BI_RGB BMP.
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


def _decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode (no PIL): signature + chunk walk with CRC checks,
    stdlib-zlib inflate of the IDAT stream, per-scanline unfiltering, and
    color-type mapping to HxWx3 RGB. Supports the common training-corpus
    shape — 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced. 16-bit, sub-byte depths and
    Adam7 interlacing raise ValueError (the quarantine path), as do CRC
    mismatches and truncated streams."""
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
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if compression != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from e
    px = _png_unfilter(raw, h, w * channels, channels).reshape(h, w, channels)
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
    PCM 8/16-bit only (format tag 1); raises ValueError otherwise."""
    if sniff_format(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(
            f"only 8/16-bit PCM supported (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) - len(data) % (2 * channels)],
                            dtype="<i2").astype(np.float64) / 32768.0
    else:
        raw = (np.frombuffer(data[: len(data) - len(data) % channels],
                             dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
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
