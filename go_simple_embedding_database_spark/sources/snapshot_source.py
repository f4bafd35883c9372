"""Reference JSON snapshots as a first-class Spark data source
(PySpark 4 Python DataSource API).

``spark.read.format("gsed_snapshot").load(path)`` yields the engine's
records schema from reference-format database snapshots
(/root/reference/database/database.go:146-182 — the whole-DB JSON object
whose quirks are pinned byte-for-byte in ``sources.json_wire``).

What this adds over ``json_wire.wire_records_df`` (text + from_json +
explode): the SOURCE decides partitioning. A single snapshot object is
inherently non-splittable, but a *directory* of snapshots is not — this
source lists files driver-side and hands each file to its own input
partition, so loading an archive of N snapshots parses N files in
parallel instead of serializing behind one task. Schema is fixed and
declared up front (no inference pass over the data).

Scale honesty, same as json_wire: per-file parallelism is the ceiling —
one 2 GB snapshot is still one task (and Python-side parse). The native
bulk format remains partitioned Parquet; this source exists so reference
snapshots can sit directly in a Spark pipeline (`.load()`, joins,
`CREATE TABLE ... USING gsed_snapshot`) without a manual import step.

Malformed files raise (task failure), matching FromFile's error contract
(database/database.go:155-160) rather than yielding an empty relation.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SNAPSHOT_FORMAT = "gsed_snapshot"

_SCHEMA = ("collection_id string, id string, embedder_id string, "
           "blob string, embedding array<double>")


def _list_snapshot_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f))
    else:
        files = sorted(glob.glob(path)) if glob.has_magic(path) else [path]
    if not files:
        raise FileNotFoundError(f"no snapshot files at {path!r}")
    return files


class _SnapshotPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class SnapshotReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("gsed_snapshot requires a path, e.g. "
                             ".format('gsed_snapshot').load('/snapshots')")
        self._files = _list_snapshot_files(path)

    def partitions(self):  # one parse task per snapshot file
        return [_SnapshotPartition(f) for f in self._files]

    def read(self, partition: _SnapshotPartition):
        with open(partition.file, encoding="utf-8") as f:
            try:
                doc = json.load(f)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"not a valid database snapshot: {partition.file}: {e}"
                ) from e
        colls = doc.get("collections") if isinstance(doc, dict) else None
        if colls is None:
            raise ValueError(
                f"not a valid database snapshot: {partition.file}: "
                "missing 'collections'")
        for cid, coll in colls.items():
            for rid, rec in (coll.get("embeddings") or {}).items():
                yield (cid, rec.get("id", rid), rec.get("embedderId"),
                       rec.get("blob"),
                       [float(v) for v in (rec.get("embedding") or [])])


class SnapshotDataSource(DataSource):
    """``USING gsed_snapshot`` — read-only; writes go through
    ``json_wire.database_to_file`` (the format is one JSON object per
    database, so a distributed writer has nothing to distribute)."""

    @classmethod
    def name(cls) -> str:
        return SNAPSHOT_FORMAT

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SnapshotReader:
        return SnapshotReader(self.options)


def register_snapshot_source(spark) -> None:
    """Idempotent registration: ``spark.dataSource.register`` keeps the
    latest registration for a name, so re-registering is safe."""
    spark.dataSource.register(SnapshotDataSource)
