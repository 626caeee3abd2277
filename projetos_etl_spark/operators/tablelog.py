"""A minimal version-manifest table log on plain parquet — the
Delta/Iceberg mechanism (atomic commits, snapshot isolation, time
travel) demonstrated hermetically, since this environment ships no
table-format jars (SCALE.md scopes the real formats as deploy-time
swaps).

Layout:

    <table>/data/<commit-uuid>-*.parquet   immutable data files
    <table>/_log/v{N}.json                 manifest: the EXACT file list
                                           visible at version N

The three guarantees, and where they come from:

- **Atomic commit**: data files land first, then the manifest is
  written via write-temp + create-exclusive ``link`` — a reader either
  sees version N (complete) or it doesn't; there is no torn state, and
  two concurrent committers can never both publish the same version
  (the loser re-reads the log and retries on top of the winner). This
  is precisely the Delta protocol's trick (the _delta_log JSON commit
  with put-if-absent semantics).
- **Snapshot isolation**: a read resolves ONE manifest and scans only
  the files it names; concurrent appends create new files + a new
  manifest and never mutate what a running query scans.
- **Time travel**: every manifest is retained, so ``read(dir, v)``
  reconstructs any historical version by file list — no data copies.

At 100 TB the manifest becomes the scan's file index (no directory
listing — the classic object-store win), and OVERWRITE commits are
metadata-only: the new manifest simply stops naming the old files.
This demo module does manifest I/O through ``os`` (local FS only, like
the fixtures); deployed against s3a/HDFS the same calls go through the
Hadoop ``FileSystem`` API (`sources/io.py::retention_sweep` shows the
pattern) — with the caveat the real formats solve properly: object
stores lack atomic rename, which is why Delta needs a log store /
conditional PUT there. That hardening is exactly why production uses
Delta/Iceberg rather than hand-rolled logs; this module exists to
demonstrate and test the MECHANISM hermetically.

Reference framing: the reference ETL (bronze:56-85) overwrote
object-store keys in place — readers could observe half-written
layers. This operator is the engine's answer to that failure mode.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


_COMMIT_RETRIES = 16


class ConcurrentCommitError(RuntimeError):
    """Raised when a committer loses the version race too many times."""


def _publish_exclusive(tmp: str, dst: str) -> None:
    """Put-if-absent publish of ``tmp`` at ``dst``: raise FileExistsError
    iff ``dst`` already exists. Prefers ``os.link`` (atomic, no data
    copy); on filesystems without hard-link support (some network /
    overlay / FAT mounts, where link raises EPERM/EOPNOTSUPP rather
    than FileExistsError) falls back to ``O_CREAT|O_EXCL`` create +
    write, which has the same exactly-one-winner guarantee."""
    try:
        os.link(tmp, dst)
        return
    except FileExistsError:
        raise
    except OSError:
        fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)  # raises FileExistsError on a loser
        try:
            with open(tmp, "rb") as fh:
                os.write(fd, fh.read())
        finally:
            os.close(fd)


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def current_version(table_dir: str) -> int:
    """Highest committed version; 0 = empty table."""
    log = _log_dir(table_dir)
    if not os.path.isdir(log):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(log)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def commit(df: DataFrame, table_dir: str, mode: str = "append") -> int:
    """Write ``df``'s rows as new immutable files and atomically publish
    the next manifest. ``mode``: "append" keeps prior files visible;
    "overwrite" publishes ONLY the new files (old data files stay on
    disk for time travel — retention/VACUUM is a separate sweep, same
    division of labor as Delta)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(_log_dir(table_dir), exist_ok=True)

    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    new_files = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            dst = os.path.join(data_dir, f"{uuid.uuid4().hex}-{f}")
            os.rename(os.path.join(staging, f), dst)
            new_files.append(dst)
    # best-effort staging cleanup (only _SUCCESS/.crc remain)
    for f in os.listdir(staging):
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)

    # Publish with put-if-absent semantics: os.link fails with EEXIST
    # if another committer already published this version (plain rename
    # would silently REPLACE it — a lost update). The loser re-reads
    # the log and retries its manifest on top of the winner's; the data
    # files are already immutable, so only the metadata step repeats.
    for _ in range(_COMMIT_RETRIES):
        v = current_version(table_dir)
        prior: list[str] = []
        if mode == "append" and v > 0:
            try:
                with open(os.path.join(_log_dir(table_dir), f"v{v}.json")) as fh:
                    prior = json.load(fh)["files"]
            except FileNotFoundError:
                continue  # a concurrent vacuum dropped v{v} — re-resolve and retry
        manifest = {"version": v + 1, "mode": mode, "files": prior + new_files}
        tmp = os.path.join(
            _log_dir(table_dir), f".v{v + 1}-{uuid.uuid4().hex}.json.tmp"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            _publish_exclusive(tmp, os.path.join(_log_dir(table_dir), f"v{v + 1}.json"))
            return v + 1
        except FileExistsError:
            continue  # concurrent winner took v+1 — rebase and retry
        finally:
            os.remove(tmp)
    raise ConcurrentCommitError(
        f"lost {_COMMIT_RETRIES} consecutive commit races on {table_dir}"
    )


def read(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Snapshot read: resolve ONE manifest (latest, or the requested
    version) and scan exactly the files it names."""
    v = version if version is not None else current_version(table_dir)
    path = os.path.join(_log_dir(table_dir), f"v{v}.json")
    with open(path) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if not files:
        raise ValueError(f"version {v} of {table_dir} names no files")
    return spark.read.parquet(*files)


def vacuum(
    table_dir: str, keep_last: int = 2, min_age_seconds: float = 600.0
) -> dict[str, int]:
    """Retire history: drop all but the newest ``keep_last`` manifests
    and delete data files referenced ONLY by the dropped versions —
    the Delta VACUUM division of labor (commits never delete; a
    separate retention sweep does, bounding time travel). Files named
    by any surviving manifest are kept, so current readers of kept
    versions are never broken.

    Two safety rules, mirroring Delta's VACUUM semantics:

    - Membership in the kept set is decided by **basename**, never the
      raw path string: all data files live in one flat ``data/`` dir
      with uuid-prefixed (unique) names, so basenames are a complete
      identity — and a raw-string compare would silently treat every
      file as unreferenced (and delete live data) whenever vacuum is
      called with a different spelling of ``table_dir`` than commit
      used (relative vs absolute, trailing slash, symlink).
    - Unreferenced files younger than ``min_age_seconds`` (mtime) are
      SKIPPED: an in-flight commit moves data files into ``data/``
      before publishing its manifest, and deleting that fresh window
      would break the commit. Delta's retention-period default plays
      the same role. Hermetic single-writer tests pass ``0.0``.

    Returns the sweep's audit counts."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    log = _log_dir(table_dir)
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(log)
        if f.startswith("v") and f.endswith(".json")
    )
    kept, dropped = versions[-keep_last:], versions[:-keep_last]
    referenced: set[str] = set()
    for v in kept:
        with open(os.path.join(log, f"v{v}.json")) as fh:
            referenced.update(os.path.basename(p) for p in json.load(fh)["files"])
    data_dir = os.path.join(table_dir, "data")
    data_files = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    cutoff = time.time() - min_age_seconds
    deleted = 0
    for f in data_files:
        if os.path.basename(f) not in referenced:
            try:
                if os.path.getmtime(f) > cutoff:
                    continue  # fresh: possibly an in-flight commit's file
                os.remove(f)
            except FileNotFoundError:
                continue  # a concurrent vacuum got it first
            deleted += 1
    for v in dropped:
        try:
            os.remove(os.path.join(log, f"v{v}.json"))
        except FileNotFoundError:
            pass
    return {
        "versions_before": len(versions),
        "versions_after": len(kept),
        "files_before": len(data_files),
        "files_deleted": deleted,
    }
