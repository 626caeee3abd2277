"""Version-manifest table log: snapshot isolation + time travel pins."""

from __future__ import annotations

import json
import os

import pytest

from projetos_etl_spark.operators import tablelog
from projetos_etl_spark.operators.tablelog import (
    ConcurrentCommitError,
    commit,
    current_version,
    read,
)


def _df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k long")


def test_append_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    assert current_version(t) == 0
    assert commit(_df(spark, [1, 2]), t) == 1
    assert commit(_df(spark, [3]), t) == 2
    assert sorted(r.k for r in read(spark, t, 1).collect()) == [1, 2]
    assert sorted(r.k for r in read(spark, t, 2).collect()) == [1, 2, 3]
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2, 3]


def test_overwrite_is_metadata_only_and_history_survives(spark, tmp_path):
    t = str(tmp_path / "t")
    commit(_df(spark, [1, 2]), t)
    v1_files = set(
        json.load(open(os.path.join(t, "_log", "v1.json")))["files"]
    )
    commit(_df(spark, [9]), t, mode="overwrite")
    # New snapshot sees only the overwrite; v1 still reconstructs.
    assert sorted(r.k for r in read(spark, t).collect()) == [9]
    assert sorted(r.k for r in read(spark, t, 1).collect()) == [1, 2]
    # The old data files were NOT deleted (time travel needs them).
    assert all(os.path.exists(f) for f in v1_files)


def test_snapshot_isolation_under_concurrent_append(spark, tmp_path):
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)
    snap = read(spark, t)  # resolved against v1's file list
    commit(_df(spark, [2]), t)  # a concurrent writer publishes v2
    # The already-resolved reader still sees exactly v1.
    assert sorted(r.k for r in snap.collect()) == [1]
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2]


def test_commit_race_is_not_a_lost_update(spark, tmp_path, monkeypatch):
    """Two committers that both read version N must publish N+1 and N+2
    — the put-if-absent link makes the loser rebase, never overwrite."""
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)  # v1

    real = tablelog.current_version
    stale_reads = iter([True, False])  # first read is stale, retry is fresh

    def racy_current_version(table_dir):
        v = real(table_dir)
        if next(stale_reads, False) and v > 1:
            return v - 1  # simulate reading the log before the rival published
        return v

    monkeypatch.setattr(tablelog, "current_version", racy_current_version)
    commit(_df(spark, [2]), t)  # rival publishes v2 cleanly
    assert commit(_df(spark, [3]), t) == 3  # we saw stale v1, must land at v3
    monkeypatch.setattr(tablelog, "current_version", real)
    assert current_version(t) == 3
    # No commit was discarded: v3 = union of all three appends.
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2, 3]
    assert sorted(r.k for r in read(spark, t, 2).collect()) == [1, 2]


def test_commit_gives_up_after_persistent_races(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)
    # A pathological rival that always wins: every version we try exists.
    monkeypatch.setattr(tablelog, "current_version", lambda d: 0)
    with pytest.raises(ConcurrentCommitError):
        commit(_df(spark, [2]), t)


def test_crashed_writer_leaves_no_torn_state(spark, tmp_path):
    """Data files present but no manifest (writer died mid-commit) must
    be invisible: reads and the next commit proceed as if it never ran."""
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)  # v1
    # Simulate a crash after the data-file stage, before the manifest.
    orphan = os.path.join(t, "data", "deadbeef-orphan.parquet")
    _df(spark, [99]).coalesce(1).write.mode("overwrite").parquet(orphan + ".d")
    part = next(
        f for f in os.listdir(orphan + ".d") if f.endswith(".parquet")
    )
    os.rename(os.path.join(orphan + ".d", part), orphan)
    assert current_version(t) == 1
    assert sorted(r.k for r in read(spark, t).collect()) == [1]  # orphan unseen
    assert commit(_df(spark, [2]), t) == 2
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2]


def test_no_torn_manifest(spark, tmp_path):
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)
    # Every visible manifest is complete JSON naming existing files —
    # the atomic-rename publish means there is never a partial one.
    log = os.path.join(t, "_log")
    for f in os.listdir(log):
        assert not f.startswith("."), "tmp manifest leaked"
        m = json.load(open(os.path.join(log, f)))
        assert all(os.path.exists(p) for p in m["files"])


def test_vacuum_drops_only_unreferenced_files(spark, tmp_path):
    from projetos_etl_spark.operators.tablelog import vacuum

    t = str(tmp_path / "t")
    commit(_df(spark, [1]).coalesce(1), t, mode="overwrite")   # v1: f1
    commit(_df(spark, [2]).coalesce(1), t, mode="overwrite")   # v2: f2
    commit(_df(spark, [3]).coalesce(1), t)                     # v3: f2+f3
    audit = vacuum(t, keep_last=2, min_age_seconds=0.0)
    assert audit == {
        "versions_before": 3,
        "versions_after": 2,
        "files_before": 3,
        "files_deleted": 1,  # only v1's file is unreferenced by v2/v3
    }
    # Kept versions still read; dropped version is gone.
    assert sorted(r.k for r in read(spark, t).collect()) == [2, 3]
    assert sorted(r.k for r in read(spark, t, 2).collect()) == [2]
    with pytest.raises(FileNotFoundError):
        read(spark, t, 1)


def test_vacuum_is_path_spelling_proof(spark, tmp_path):
    """Vacuum called with a DIFFERENT spelling of table_dir than commit
    used (trailing slash here; relative/symlink are the same class) must
    not treat every live file as unreferenced — membership is decided by
    basename, not raw path string."""
    from projetos_etl_spark.operators.tablelog import vacuum

    t = str(tmp_path / "t")
    commit(_df(spark, [1]).coalesce(1), t, mode="overwrite")   # v1: f1
    commit(_df(spark, [2]).coalesce(1), t, mode="overwrite")   # v2: f2
    audit = vacuum(t + "/", keep_last=2, min_age_seconds=0.0)
    assert audit["files_deleted"] == 0  # both files referenced by kept v1/v2
    assert sorted(r.k for r in read(spark, t, 1).collect()) == [1]
    assert sorted(r.k for r in read(spark, t).collect()) == [2]


def test_vacuum_staleness_window_protects_inflight_files(spark, tmp_path):
    """An unreferenced data file YOUNGER than min_age_seconds (the shape
    an in-flight commit leaves between staging its data and publishing
    its manifest) must survive the sweep; dropped manifests still go."""
    from projetos_etl_spark.operators.tablelog import vacuum

    t = str(tmp_path / "t")
    commit(_df(spark, [1]).coalesce(1), t, mode="overwrite")   # v1: f1
    commit(_df(spark, [2]).coalesce(1), t, mode="overwrite")   # v2: f2
    commit(_df(spark, [3]).coalesce(1), t, mode="overwrite")   # v3: f3
    audit = vacuum(t, keep_last=1)  # default window: everything is fresh
    assert audit["files_deleted"] == 0
    assert audit["versions_after"] == 1
    data = os.path.join(t, "data")
    assert len([f for f in os.listdir(data) if f.endswith(".parquet")]) == 3
    # Age the survivors out of the window: a second sweep reclaims them.
    for f in os.listdir(data):
        os.utime(os.path.join(data, f), (0, 0))
    audit2 = vacuum(t, keep_last=1)
    assert audit2["files_deleted"] == 2  # f1/f2 gone, f3 still referenced
    assert sorted(r.k for r in read(spark, t).collect()) == [3]


def test_reader_pinned_to_retained_snapshot_survives_vacuum(spark, tmp_path):
    """The reader-during-vacuum probe: a DataFrame resolved against a
    RETAINED version before the sweep still scans all its files after
    vacuum(keep_last=N); a vacuumed version raises a clear error."""
    from projetos_etl_spark.operators.tablelog import vacuum

    t = str(tmp_path / "t")
    commit(_df(spark, [1]).coalesce(1), t, mode="overwrite")   # v1: f1
    commit(_df(spark, [2]).coalesce(1), t, mode="overwrite")   # v2: f2
    commit(_df(spark, [3]).coalesce(1), t)                     # v3: f2+f3
    pinned = read(spark, t, 2)       # resolved pre-vacuum, within keep_last=2
    vacuum(t, keep_last=2, min_age_seconds=0.0)
    assert sorted(r.k for r in pinned.collect()) == [2]  # all files resolve
    with pytest.raises(FileNotFoundError):
        read(spark, t, 1)  # vacuumed version: clear missing-manifest error


def test_commit_publish_works_without_hardlink_support(spark, tmp_path, monkeypatch):
    """On filesystems where os.link raises EPERM/EOPNOTSUPP (not
    FileExistsError), publish falls back to O_CREAT|O_EXCL with the same
    exactly-one-winner semantics."""
    import errno

    def no_hardlinks(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(tablelog.os, "link", no_hardlinks)
    t = str(tmp_path / "t")
    assert commit(_df(spark, [1]), t) == 1
    assert commit(_df(spark, [2]), t) == 2
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2]
    # The fallback still refuses to clobber an existing manifest.
    with pytest.raises(FileExistsError):
        tablelog._publish_exclusive(
            os.path.join(t, "_log", "v1.json"),
            os.path.join(t, "_log", "v2.json"),
        )


def test_append_retries_when_vacuum_drops_prior_manifest(spark, tmp_path, monkeypatch):
    """An append that resolves version v, then finds v's manifest gone
    (a concurrent vacuum dropped it between current_version and the
    open), must re-resolve and retry — not crash with FileNotFoundError."""
    t = str(tmp_path / "t")
    commit(_df(spark, [1]), t)  # v1
    commit(_df(spark, [2]), t)  # v2

    real = tablelog.current_version
    stale = iter([True])

    def stale_then_fresh(table_dir):
        v = real(table_dir)
        if next(stale, False):
            return 1  # v1's manifest is about to be vacuumed away
        return v

    monkeypatch.setattr(tablelog, "current_version", stale_then_fresh)
    os.remove(os.path.join(t, "_log", "v1.json"))  # the concurrent vacuum
    assert commit(_df(spark, [3]), t) == 3
    monkeypatch.setattr(tablelog, "current_version", real)
    assert sorted(r.k for r in read(spark, t).collect()) == [1, 2, 3]
