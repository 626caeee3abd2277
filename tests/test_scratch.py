"""The per-process scratch root: ownership, isolation, and pruning.

Why this matters: operator entries return DataFrames that lazily READ
the files they spooled, so nothing may delete a LIVE session's scratch;
yet without any reaper a host accumulates a table copy per invocation
forever. ``scratch.py`` resolves the tension by keying every dir to its
owner PID and letting the next session sweep dead owners.
"""

from __future__ import annotations

import os
import subprocess
import sys

import projetos_etl_spark.scratch as scratch
from projetos_etl_spark.scratch import (
    prune_dead_roots,
    scratch_dir,
    scratch_path,
    scratch_root,
)


def test_root_is_per_pid_and_created(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    root = scratch_root()
    assert root == str(tmp_path / f"pes_scratch_{os.getpid()}")
    assert os.path.isdir(root)


def test_scratch_dir_lives_under_root_and_is_fresh(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    a, b = scratch_dir("csv_"), scratch_dir("csv_")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    assert os.path.dirname(a) == scratch_root()


def test_scratch_path_is_fixed_not_created(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    p = scratch_path("dynpart_scratch")
    assert p == scratch_path("dynpart_scratch")  # stable within a process
    assert not os.path.exists(p)  # reuse-and-reset sites create it themselves


def test_prune_removes_dead_owners_root(tmp_path):
    # A real, genuinely-dead PID: spawn a child and let it exit.
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    dead_root = tmp_path / f"pes_scratch_{dead_pid}"
    (dead_root / "sub").mkdir(parents=True)
    (dead_root / "sub" / "part.parquet").write_bytes(b"x")
    assert prune_dead_roots(str(tmp_path)) == 1
    assert not dead_root.exists()


def test_prune_spares_live_owner_and_own_root(tmp_path):
    own = tmp_path / f"pes_scratch_{os.getpid()}"
    own.mkdir()
    live = tmp_path / f"pes_scratch_{os.getppid()}"  # parent: alive by construction
    live.mkdir()
    prune_dead_roots(str(tmp_path))
    assert own.exists() and live.exists()


def test_prune_spares_non_pid_and_fresh_legacy_entries(tmp_path):
    (tmp_path / "pes_scratch_notapid").mkdir()
    fresh_legacy = tmp_path / "pes_csv_abc123"  # pre-root layout, just written
    fresh_legacy.mkdir()
    unrelated = tmp_path / "other_dir"
    unrelated.mkdir()
    prune_dead_roots(str(tmp_path))
    assert (tmp_path / "pes_scratch_notapid").exists()
    assert fresh_legacy.exists()  # younger than the 24h staleness cutoff
    assert unrelated.exists()


def test_prune_removes_stale_legacy_dirs(tmp_path):
    stale = tmp_path / "pes_orc_deadbeef"
    stale.mkdir()
    old = 1_000_000.0  # epoch 1970: far past the 24h cutoff
    os.utime(stale, (old, old))
    assert prune_dead_roots(str(tmp_path)) == 1
    assert not stale.exists()


def test_first_root_call_prunes_once(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(scratch, "_pruned_this_process", False)
    stale = tmp_path / "pes_json_stale"
    stale.mkdir()
    os.utime(stale, (1_000_000.0, 1_000_000.0))
    scratch_root()
    assert not stale.exists()  # swept by first use
    late = tmp_path / "pes_json_late"
    late.mkdir()
    os.utime(late, (1_000_000.0, 1_000_000.0))
    scratch_root()
    assert late.exists()  # subsequent calls don't re-scan (prune rides on process start)


def test_prune_legacy_pid_dirs_go_by_pid_probe_not_mtime(tmp_path):
    import subprocess
    import sys

    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    old = 1_000_000.0  # epoch 1970: far past the 24h cutoff

    # A LIVE owner's legacy dir is never deleted, however stale — a >24h
    # session running the pre-scratch.py build may still lazily read it
    # during a mixed-version rollout window.
    live_stale = tmp_path / f"pes_tablelog_scratch_{os.getppid()}"
    live_stale.mkdir()
    os.utime(live_stale, (old, old))

    # A DEAD owner's legacy dir is garbage immediately (no 24h wait).
    dead_fresh = tmp_path / f"pes_stream_upsert_log_{dead_pid}"
    dead_fresh.mkdir()

    assert prune_dead_roots(str(tmp_path)) == 1
    assert live_stale.exists()
    assert not dead_fresh.exists()


def test_prune_legacy_pid_prefix_with_malformed_suffix_uses_mtime(tmp_path):
    # No parseable owner: the anonymous 24h-mtime rule applies.
    stale = tmp_path / "pes_tlmerge_scratch_notapid"
    stale.mkdir()
    os.utime(stale, (1_000_000.0, 1_000_000.0))
    fresh = tmp_path / "pes_dynpart_scratch_alsonotapid"
    fresh.mkdir()
    assert prune_dead_roots(str(tmp_path)) == 1
    assert not stale.exists()
    assert fresh.exists()
