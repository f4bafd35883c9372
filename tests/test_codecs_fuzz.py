"""Decoder liveness fuzz: mutated media bytes must FAIL FAST or decode.

decode_media's quarantine catch is ``except Exception``, so any raised
taxonomy is contained — but a HANG (an offset loop that stops advancing)
or a MemoryError (a size field trusted before bounds-checking) inside
one Arrow batch would stall or kill a 100 TB decode job. Every trial
runs under a CPU-time budget (ITIMER_VIRTUAL / SIGVTALRM, not wall
clock: a co-tenant box stretching wall time must not fake a hang — the
r06 full-suite run tripped the old SIGALRM wall budget exactly that way
while three Spark sessions shared the machine; an infinite loop still
burns CPU and fires the virtual timer). A generous ITIMER_REAL backstop
(ADVICE r06) additionally catches a NON-CPU hang — a blocking call or a
pathological sleep burns no CPU, so the virtual timer alone would wedge
the run indefinitely; 60 s of wall per 5 s of CPU budget is slack no
co-tenant load has ever approached (worst observed stretch ~1.4x). The
only acceptable outcomes are success or a prompt exception."""

import signal
import zlib

import numpy as np
import pytest

from go_simple_embedding_database_spark.functions import codecs

TRIALS_PER_FORMAT = 400
PER_TRIAL_SEC = 5.0
# Wall-clock hard backstop per trial: only a BLOCKING hang (no CPU burn)
# reaches it, since the CPU budget above fires first on compute loops.
WALL_BACKSTOP_SEC = 60.0


class _Timeout(Exception):
    pass


def _seeds():
    rng = np.random.default_rng(19)
    img = (rng.integers(0, 4, (9, 7, 3)) * 64).astype(np.uint8)
    wav = (b"RIFF" + (36 + 64).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + (64).to_bytes(4, "little") + bytes(64))
    return {
        "ppm": codecs.encode_ppm(img),
        "jpeg": codecs.encode_jpeg(img),
        "jpeg_prog": codecs.encode_jpeg(img, progressive=True),
        "gif": codecs.encode_gif([img, img]),
        "tiff_lzw": codecs.encode_tiff(img, compression="lzw", predictor=2),
        "tiff_pb": codecs.encode_tiff(img, compression="packbits"),
        "avi": codecs.encode_avi_mjpeg([img, img]),
        "wav": wav,
    }


@pytest.mark.parametrize("fmt", sorted(_seeds()))
def test_mutated_bytes_fail_fast_never_hang(fmt):
    seed = _seeds()[fmt]
    # crc32, NOT hash(): str hashing is salted per process (PYTHONHASHSEED),
    # which made every run mutate DIFFERENT bytes — the round-7 GIF
    # decompression bomb hid behind that lottery for six rounds (only
    # ~1-in-5 processes drew a screen-descriptor hit). Deterministic
    # seeding makes the covered mutation set reproducible; new coverage
    # comes from raising TRIALS_PER_FORMAT, not from reruns.
    rng = np.random.default_rng(zlib.crc32(fmt.encode()))
    old = signal.signal(signal.SIGVTALRM,
                        lambda *_: (_ for _ in ()).throw(_Timeout()))
    old_wall = signal.signal(signal.SIGALRM,
                             lambda *_: (_ for _ in ()).throw(_Timeout()))
    try:
        for t in range(TRIALS_PER_FORMAT):
            p = bytearray(seed)
            mode = t % 3
            if mode == 0:                       # truncate anywhere
                p = p[: int(rng.integers(1, len(p) + 1))]
            elif mode == 1:                     # flip random bytes
                for _ in range(int(rng.integers(1, 6))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            else:                               # lying size field
                off = int(rng.integers(0, max(1, len(p) - 4)))
                p[off:off + 4] = b"\xff\xff\xff\x7f"
            signal.setitimer(signal.ITIMER_VIRTUAL, PER_TRIAL_SEC)
            signal.setitimer(signal.ITIMER_REAL, WALL_BACKSTOP_SEC)
            try:
                fn = codecs.decode_wav if fmt == "wav" else codecs.decode_image
                fn(bytes(p))
            except _Timeout:
                pytest.fail(f"{fmt} trial {t}: decoder hung > "
                            f"{PER_TRIAL_SEC}s CPU (or blocked > "
                            f"{WALL_BACKSTOP_SEC}s wall) on mutated input")
            except MemoryError:
                pytest.fail(f"{fmt} trial {t}: unbounded allocation from "
                            f"a trusted size field")
            except Exception:
                pass                            # fail-fast is the contract
            finally:
                signal.setitimer(signal.ITIMER_VIRTUAL, 0)
                signal.setitimer(signal.ITIMER_REAL, 0)
    finally:
        signal.signal(signal.SIGVTALRM, old)
        signal.signal(signal.SIGALRM, old_wall)
