"""Version-manifest table log: snapshot isolation + time travel pins."""

from __future__ import annotations

import json
import os

from projetos_etl_spark.operators.tablelog import commit, current_version, read


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
