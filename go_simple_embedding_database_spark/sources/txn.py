"""Minimal transactional table layer over plain parquet — manifest commits.

The container has no Delta/Iceberg, so rewrite-in-place sinks (compaction,
upsert) swap directories and accept a visibility window. This module is
the smallest layer that removes that window, using the same core idea as
the real table formats: data files are IMMUTABLE and a tiny, atomically
committed MANIFEST names the files that constitute each version.

- Writers write new parquet files into a per-version data dir (never
  touching existing files), then COMMIT by creating
  ``_manifests/v<NNNNNN>.json`` with O_CREAT|O_EXCL — an atomic
  claim-or-fail on POSIX. Losing a race raises ``CommitConflictError``
  (optimistic concurrency; the caller re-reads and retries), never
  corrupts.
- Readers list manifests, pick the highest committed version, and read
  exactly the files it names — snapshot isolation for free: a concurrent
  commit changes which manifest is latest, never the bytes under a
  reader.
- Old versions stay readable (``version=``: time travel) until
  ``vacuum`` drops manifests-and-files older than a kept horizon.

Scale notes: the manifest holds file PATHS (and row counts), so commit
cost is O(files in the version), independent of data volume — the same
contract as Delta's JSON log before checkpointing. What this layer
deliberately does NOT do (and the real formats do): per-column stats for
file skipping, manifest checkpoint compaction, multi-table transactions.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


# vacuum() only removes crashed-writer manifest temp files older than
# this: a live writer is between fsync and the link(2) claim for
# milliseconds, so one hour cannot race an in-flight commit while still
# sweeping real crash leftovers on the next maintenance run.
_TMP_MANIFEST_TTL_SEC = 3600.0


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:06d}.json")


def list_versions(path: str) -> list[int]:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(path: str) -> int | None:
    vs = list_versions(path)
    return vs[-1] if vs else None


def _data_files(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_")))


def commit_version(spark: SparkSession, df: DataFrame, path: str,
                   expected_base: int | None = None) -> int:
    """Write ``df`` as the next table version and commit it atomically.

    ``expected_base``: optimistic-concurrency guard — the version this
    writer derived its data from (None for a blind overwrite-latest).
    If another writer committed in between, the exclusive manifest
    create fails and CommitConflictError is raised; nothing of the
    failed attempt is visible (its data dir carries no manifest and is
    vacuum-fodder).
    """
    import uuid

    base = latest_version(path)
    if expected_base is not None and base != expected_base:
        raise CommitConflictError(
            f"table advanced to v{base} while this writer worked from "
            f"v{expected_base}; re-read and retry")
    version = (base if base is not None else 0) + 1
    # Writer-unique data dir: two racers computing the same next version
    # must not share a directory — with a deterministic name the loser's
    # overwrite-mode write would delete the WINNER's already-committed
    # files after the winner claimed the manifest naming them. With the
    # suffix, the loser's whole dir simply goes unclaimed (vacuum-fodder),
    # which is the 'nothing of the failed attempt is visible' contract.
    data_dir = os.path.join(path, f"data_v{version:06d}_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(data_dir)
    files = _data_files(data_dir)
    manifest = {"version": version, "files": files,
                "base": base, "format": "parquet/manifest-v1"}
    os.makedirs(_manifest_dir(path), exist_ok=True)
    mpath = _manifest_path(path, version)
    # Crash-safe claim: the manifest must never exist half-written — a
    # claimed-but-empty v-file would read as a committed version and wedge
    # every reader on JSONDecodeError. Write the FULL payload to a
    # writer-unique temp file, fsync, then link(2) it to the version name:
    # link is atomic and fails (EEXIST) if the version was claimed, giving
    # O_EXCL semantics with the content already durable.
    tmp = os.path.join(_manifest_dir(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, mpath)
    except FileExistsError:
        raise CommitConflictError(
            f"version {version} was committed concurrently") from None
    finally:
        os.unlink(tmp)
    return version


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Snapshot read: exactly the files the (latest or given) committed
    manifest names. Immune to concurrent commits and to uncommitted
    data dirs from failed writers."""
    v = latest_version(path) if version is None else version
    if v is None or not os.path.exists(_manifest_path(path, v)):
        raise FileNotFoundError(
            f"no committed version {'(empty table)' if v is None else v} "
            f"at {path}")
    with open(_manifest_path(path, v)) as f:
        manifest = json.load(f)
    return spark.read.parquet(*manifest["files"])


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions: delete their
    manifests FIRST (readers stop resolving them atomically), then their
    data dirs, plus any uncommitted data dirs no manifest ever claimed.
    Returns the removed versions.

    Concurrency caveat (same as Delta VACUUM's retention window): do not
    run while a writer is mid-commit — an unclaimed data dir is
    indistinguishable from a crashed writer's leftovers, and vacuuming
    it out from under an in-flight commit leaves that manifest naming
    deleted files. Schedule vacuum in the maintenance window."""
    import shutil

    vs = list_versions(path)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    kept_files: set[str] = set()
    for v in keep:
        with open(_manifest_path(path, v)) as f:
            kept_files.update(json.load(f)["files"])
    for v in drop:
        os.remove(_manifest_path(path, v))
    # Crashed writers can leave fully-written-but-never-linked manifest
    # temp files; they are invisible to readers and safe to drop once
    # stale. Age-gate the removal: a LIVE writer sits between fsync and
    # os.link for milliseconds, so deleting only temp files older than
    # the safety window can never yank a manifest out from under an
    # in-flight commit (which would surface as FileNotFoundError instead
    # of a clean commit/CommitConflictError).
    now = time.time()
    for name in os.listdir(_manifest_dir(path)):
        if name.startswith(".tmp-"):
            full = os.path.join(_manifest_dir(path), name)
            try:
                if now - os.path.getmtime(full) > _TMP_MANIFEST_TTL_SEC:
                    os.remove(full)
            except FileNotFoundError:
                pass  # another vacuum / the writer's own cleanup won
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if (name.startswith("data_v") and os.path.isdir(full)
                and not any(fp.startswith(full + os.sep)
                            for fp in kept_files)):
            shutil.rmtree(full)
    return drop


def compact_version(spark: SparkSession, path: str,
                    target_files: int = 1) -> int:
    """OPTIMIZE for the manifest layer: rewrite the LATEST version's rows
    into ``target_files`` files and commit the result as a new version —
    same rows, fewer files (the small-file problem is the chronic cost of
    streaming/incremental appends; open-per-file dominates at 100 TB).

    Runs through the normal optimistic-concurrency path: the read and the
    commit pin the same base version, so a writer landing in between
    raises CommitConflictError and nothing is lost — rerun against the
    new tip. Old versions stay readable (time travel) until ``vacuum``.
    """
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    with open(_manifest_path(path, base)) as f:
        n_files = len(json.load(f)["files"])
    if n_files <= target_files:
        # Already compact: committing a redundant full copy every
        # maintenance run would grow the store until vacuum for nothing.
        return base
    df = read_version(spark, path, base).coalesce(target_files)
    return commit_version(spark, df, path, expected_base=base)
