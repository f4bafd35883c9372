"""Build-once-per-source materialization (the fingerprint-marker protocol).

One implementation of the ensure contract shared by the quantized-vector
copy and the IVF index (``operators.ann``) and the transactional
aggregate snapshot (``sources.maintenance``): a ``_source_fingerprint``
marker file beside the artifact records which source state it was built
from; a match skips the build, anything else (missing artifact, missing
marker, stale fingerprint) rebuilds. Previously each call site hand-
rolled the read/compare/teardown/write sequence — three copies that had
to stay in sync on the crash-ordering subtleties below.

Crash ordering: the marker is written ONLY after a successful build, so
a crash mid-build (or between build and marker write) leaves a missing/
stale marker and the next call rebuilds — the safe direction. The
converse order would serve a half-built artifact as fresh.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

MARKER_NAME = "_source_fingerprint"


def ensure_materialized(path: str, fingerprint: str | None,
                        build: Callable[[], None], *,
                        teardown: bool = True,
                        ready: Callable[[], bool] | None = None) -> bool:
    """Run ``build()`` unless ``path`` already holds an artifact built
    from ``fingerprint``. Returns True if a (re)build happened.

    - ``fingerprint=None`` disables freshness tracking: the build ALWAYS
      runs (and no marker is written) — without a token there is no way
      to know the artifact is fresh, so serving it would be a guess.
    - ``teardown``: remove ``path`` before rebuilding (directory-swap
      artifacts). Pass False for stores that version internally and must
      keep history (the txn-committed snapshot).
    - ``ready``: artifact-present probe; defaults to ``os.path.exists``
      on ``path``. Stores with their own commit notion (txn manifests)
      pass a stricter check.
    """
    marker = os.path.join(path, MARKER_NAME)
    present = ready() if ready is not None else os.path.exists(path)
    if present and fingerprint is not None and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == fingerprint:
                return False
    if teardown and os.path.exists(path):
        shutil.rmtree(path)
    build()
    if fingerprint is not None:
        with open(marker, "w") as fh:
            fh.write(fingerprint)
    return True
