"""Manifest-committed versioned tables (sources/txn.py)."""

import os

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.sources import txn


def _t(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


def test_commit_read_roundtrip_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t1")
    v1 = txn.commit_version(spark, _t(spark, [(1, "a"), (2, "b")]), path)
    v2 = txn.commit_version(spark, _t(spark, [(1, "a2"), (3, "c")]), path)
    assert (v1, v2) == (1, 2)
    latest = {r.id: r.text for r in txn.read_version(spark, path).collect()}
    assert latest == {1: "a2", 3: "c"}
    old = {r.id: r.text
           for r in txn.read_version(spark, path, version=1).collect()}
    assert old == {1: "a", 2: "b"}  # time travel unaffected by v2


def test_conflicting_commit_raises_and_leaves_table_intact(spark, tmp_path):
    """Optimistic concurrency: a writer that worked from a stale base
    must fail loudly; the winner's version stays the readable truth."""
    path = str(tmp_path / "t2")
    txn.commit_version(spark, _t(spark, [(1, "a")]), path)
    base = txn.latest_version(path)
    # winner commits from the same base first
    txn.commit_version(spark, _t(spark, [(1, "winner")]), path,
                       expected_base=base)
    with pytest.raises(txn.CommitConflictError):
        txn.commit_version(spark, _t(spark, [(1, "loser")]), path,
                           expected_base=base)
    got = {r.text for r in txn.read_version(spark, path).collect()}
    assert got == {"winner"}


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """A failed writer's data dir (no manifest) must never be read."""
    path = str(tmp_path / "t3")
    txn.commit_version(spark, _t(spark, [(1, "a")]), path)
    # simulate a crashed writer: data written, manifest never created
    _t(spark, [(9, "ghost")]).write.parquet(
        os.path.join(path, "data_v000099"))
    got = {r.id for r in txn.read_version(spark, path).collect()}
    assert got == {1}


def test_vacuum_drops_old_versions_and_orphans(spark, tmp_path):
    path = str(tmp_path / "t4")
    for i in range(4):
        txn.commit_version(spark, _t(spark, [(i, f"v{i}")]), path)
    _t(spark, [(9, "ghost")]).write.parquet(
        os.path.join(path, "data_v000099"))  # orphan from a failed writer
    dropped = txn.vacuum(path, keep_last=2)
    assert dropped == [1, 2]
    assert txn.list_versions(path) == [3, 4]
    assert not os.path.isdir(os.path.join(path, "data_v000001"))
    assert not os.path.isdir(os.path.join(path, "data_v000099"))
    # survivors still read
    assert txn.read_version(spark, path, version=3).count() == 1
    with pytest.raises(FileNotFoundError):
        txn.read_version(spark, path, version=1)


def test_losing_racer_cannot_clobber_winner(spark, tmp_path, monkeypatch):
    """The race the deterministic data dir made dangerous: a loser who
    computed the same next version used to overwrite-write the WINNER's
    data directory before failing its manifest claim. Data dirs are now
    writer-unique, so the loser's write lands in its own dir and the
    winner's committed files survive."""
    from go_simple_embedding_database_spark.sources import txn
    path = str(tmp_path / "t")
    txn.commit_version(spark, spark.range(3).toDF("a"), path)
    txn.commit_version(spark, spark.range(5).toDF("a"), path)  # winner's v2
    winner = sorted(r.a for r in txn.read_version(spark, path, 2).collect())

    # Loser: stale view of the log (read latest BEFORE the winner's
    # commit), so it also computes version 2, writes its data, and must
    # fail the claim WITHOUT touching the winner's files.
    monkeypatch.setattr(txn, "latest_version", lambda p: 1)
    with pytest.raises(txn.CommitConflictError):
        txn.commit_version(spark, spark.range(99).toDF("a"), path)
    monkeypatch.undo()
    assert sorted(r.a for r in txn.read_version(spark, path, 2).collect()) \
        == winner == [0, 1, 2, 3, 4]


def test_crashed_manifest_writer_leaves_no_committed_garbage(
        spark, tmp_path, monkeypatch):
    """A writer dying between manifest payload write and the link(2)
    claim must leave the table exactly as it was: no claimed-but-empty
    manifest (the old O_EXCL-then-dump order could), latest version
    unchanged, and vacuum sweeps the orphaned temp file."""
    import os as _os

    from go_simple_embedding_database_spark.sources import txn
    path = str(tmp_path / "t")
    txn.commit_version(spark, spark.range(3).toDF("a"), path)
    txn.commit_version(spark, spark.range(4).toDF("a"), path)
    txn.commit_version(spark, spark.range(5).toDF("a"), path)

    real_link = _os.link
    monkeypatch.setattr(_os, "link", lambda *a: (_ for _ in ()).throw(
        OSError("simulated crash at claim time")))
    with pytest.raises(OSError, match="simulated crash"):
        txn.commit_version(spark, spark.range(9).toDF("a"), path)
    monkeypatch.setattr(_os, "link", real_link)

    assert txn.latest_version(path) == 3
    assert txn.read_version(spark, path).count() == 5  # table intact
    mdir = _os.path.join(path, "_manifests")
    # The aborted commit cleans its own temp file (finally-unlink) — only
    # a REAL process death leaves one. Plant one to exercise vacuum.
    planted = _os.path.join(mdir, ".tmp-planted.json")
    with open(planted, "w") as f:
        f.write("{}")
    # A FRESH temp file is indistinguishable from a live writer mid-claim
    # — vacuum must leave it alone (age gate), else it could yank a
    # manifest out from under an in-flight commit.
    txn.vacuum(path, keep_last=2)
    assert _os.path.exists(planted), (
        "age-gated vacuum must not sweep a fresh temp manifest")
    # Once stale past the TTL it is crash garbage and gets swept.
    _os.utime(planted, (_os.path.getatime(planted),
                        _os.path.getmtime(planted)
                        - txn._TMP_MANIFEST_TTL_SEC - 1))
    txn.vacuum(path, keep_last=2)
    assert not [n for n in _os.listdir(mdir) if n.startswith(".tmp-")]


def test_compact_version_same_rows_fewer_files(spark, tmp_path):
    import os as _os

    from go_simple_embedding_database_spark.sources import txn
    path = str(tmp_path / "t")
    txn.commit_version(spark, spark.range(100).repartition(8).toDF("a"), path)
    before = sorted(r.a for r in txn.read_version(spark, path).collect())
    with open(_os.path.join(path, "_manifests", "v000001.json")) as f:
        import json as _json
        n_before = len(_json.load(f)["files"])
    assert n_before > 1
    v = txn.compact_version(spark, path)
    assert v == 2
    after = sorted(r.a for r in txn.read_version(spark, path).collect())
    assert after == before
    with open(_os.path.join(path, "_manifests", "v000002.json")) as f:
        import json as _json
        assert len(_json.load(f)["files"]) == 1
    # time travel still serves the pre-compaction layout
    assert txn.read_version(spark, path, 1).count() == 100


def test_compact_version_conflicts_like_any_writer(spark, tmp_path, monkeypatch):
    from go_simple_embedding_database_spark.sources import txn
    path = str(tmp_path / "t")
    txn.commit_version(spark, spark.range(10).toDF("a"), path)
    txn.commit_version(spark, spark.range(20).toDF("a"), path)
    # a compactor with a stale view of the log must conflict, not clobber
    real = txn.latest_version
    monkeypatch.setattr(txn, "latest_version", lambda p: 1)
    with pytest.raises(txn.CommitConflictError):
        txn.compact_version(spark, path)
    monkeypatch.undo()
    assert txn.read_version(spark, path).count() == 20


def test_compact_version_noop_when_already_compact(spark, tmp_path):
    from go_simple_embedding_database_spark.sources import txn
    path = str(tmp_path / "t")
    txn.commit_version(spark, spark.range(10).coalesce(1).toDF("a"), path)
    assert txn.compact_version(spark, path) == 1  # no redundant version
    assert txn.list_versions(path) == [1]
    with pytest.raises(ValueError):
        txn.compact_version(spark, path, target_files=0)
