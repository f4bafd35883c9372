"""Decoder liveness fuzz: mutated media bytes must FAIL FAST or decode.

decode_media's quarantine catch is ``except Exception``, so any raised
taxonomy is contained — but a HANG (an offset loop that stops advancing)
or a MemoryError (a size field trusted before bounds-checking) inside
one Arrow batch would stall or kill a 100 TB decode job. Every trial
runs under a CPU-time budget (ITIMER_VIRTUAL / SIGVTALRM, not wall
clock: a co-tenant box stretching wall time must not fake a hang — the
r06 full-suite run tripped the old SIGALRM wall budget exactly that way
while three Spark sessions shared the machine; an infinite loop still
burns CPU and fires the virtual timer). The only acceptable outcomes
are success or a prompt exception."""

import signal

import numpy as np
import pytest

from go_simple_embedding_database_spark.functions import codecs

TRIALS_PER_FORMAT = 150
PER_TRIAL_SEC = 5.0


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
    rng = np.random.default_rng(hash(fmt) % (2**32))
    old = signal.signal(signal.SIGVTALRM,
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
            try:
                fn = codecs.decode_wav if fmt == "wav" else codecs.decode_image
                fn(bytes(p))
            except _Timeout:
                pytest.fail(f"{fmt} trial {t}: decoder hung > "
                            f"{PER_TRIAL_SEC}s on mutated input")
            except MemoryError:
                pytest.fail(f"{fmt} trial {t}: unbounded allocation from "
                            f"a trusted size field")
            except Exception:
                pass                            # fail-fast is the contract
            finally:
                signal.setitimer(signal.ITIMER_VIRTUAL, 0)
    finally:
        signal.signal(signal.SIGVTALRM, old)
