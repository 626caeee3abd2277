"""Per-process scratch-space management for operators that spool
tables to local disk (CSV/JSONL/ORC/XML round-trips, Derby JDBC, the
table log, streaming watch dirs, ...).

The problem this solves: many registry entries return a DataFrame that
lazily READS the files they just wrote, so the classic
``try/finally: rmtree`` is wrong — deletion would race the caller's
``collect()``. The previous compromise (leave the dir behind) leaked a
table copy per invocation: a full 326-entry sweep leaves dozens of
directories in ``tempfile.gettempdir()``, and repeated pytest / bench /
driver sessions accumulate gigabytes that nothing ever removes.

The mechanism here is ownership by process:

- every scratch dir lives under ONE per-process root,
  ``<tmp>/pes_scratch_<pid>/`` — so a dir's owner is readable from its
  path, and concurrent sessions on one host can never clobber each
  other (the r6 ADVICE race);
- the first ``scratch_root()`` call in a process prunes sibling roots
  whose owner PID is dead (``os.kill(pid, 0)`` probe) — so every new
  session garbage-collects what crashed or finished sessions left
  behind, including after ``kill -9``, with no daemon and no atexit
  ordering hazards (Spark may still hold file handles at interpreter
  exit);
- a live owner's root is never touched: lazily-read DataFrames stay
  valid for exactly as long as the process that created them can still
  run a ``collect()``.

At 100 TB the analogous concern is lifecycle-tagging transient
object-store prefixes (e.g. S3 lifecycle rules on a ``_scratch/``
prefix) — the principle is the same: scratch must carry its owner and
expire mechanically, never rely on every code path remembering to
clean up.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

_PREFIX = "pes_scratch_"
#: Legacy (pre-root) scratch dirs all started with this; the one-time
#: migration sweep below retires them once they are plausibly orphaned.
_LEGACY_PREFIX = "pes_"
_LEGACY_MAX_AGE_SECONDS = 24 * 3600.0
#: Legacy (pre-root) dir families whose names embedded the owner PID
#: (``pes_tablelog_scratch_<pid>`` etc.).  For these the pid probe is
#: authoritative, exactly as for rooted dirs: a LIVE owner may hold lazy
#: DataFrame references indefinitely (>24h sessions exist — mtime alone
#: must never delete under it during a mixed-version rollout), while a
#: dead owner's dir is garbage immediately.  Anonymous ``mkdtemp``
#: leftovers (random suffix, no owner recorded) keep the 24h mtime rule.
_LEGACY_PID_PREFIXES = (
    "pes_stream_upsert_log_",
    "pes_tablelog_scratch_",
    "pes_tlmerge_scratch_",
    "pes_tlvacuum_scratch_",
    "pes_dynpart_scratch_",
    "pes_mlcsv_scratch_",
)

_pruned_this_process = False


def _pid_alive(pid: int) -> bool:
    """True iff ``pid`` names a live process we can observe. A
    PermissionError means the process exists but belongs to someone
    else — treat as alive (never delete what we don't own)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def prune_dead_roots(base: str | None = None) -> int:
    """Remove sibling scratch roots whose owner PID is dead, plus
    legacy un-rooted ``pes_*`` dirs that are provably orphaned: families
    that embedded their owner PID (``_LEGACY_PID_PREFIXES``) go by the
    pid probe — dead owner deleted at any age, live owner NEVER deleted
    however stale — and only truly anonymous ``mkdtemp`` leftovers use
    the 24h-mtime rule. Returns dirs removed.
    Safe concurrently: only dead owners' roots are touched, and
    concurrent pruners racing on the same dir are absorbed by
    ``ignore_errors``."""
    base = base or tempfile.gettempdir()
    cutoff = time.time() - _LEGACY_MAX_AGE_SECONDS
    removed = 0
    try:
        entries = os.listdir(base)
    except OSError:
        return 0
    for entry in entries:
        path = os.path.join(base, entry)
        if entry.startswith(_PREFIX):
            suffix = entry[len(_PREFIX) :]
            if (
                suffix.isdigit()
                and int(suffix) != os.getpid()
                and not _pid_alive(int(suffix))
            ):
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        elif entry.startswith(_LEGACY_PREFIX) and os.path.isdir(path):
            pid_prefix = next(
                (p for p in _LEGACY_PID_PREFIXES if entry.startswith(p)), None
            )
            if pid_prefix is not None:
                suffix = entry[len(pid_prefix) :]
                if suffix.isdigit():
                    pid = int(suffix)
                    if pid != os.getpid() and not _pid_alive(pid):
                        shutil.rmtree(path, ignore_errors=True)
                        removed += 1
                    continue  # live (or our own) owner: never delete
                # malformed pid suffix: fall through to the mtime rule
            try:
                stale = os.path.getmtime(path) < cutoff
            except OSError:
                continue
            if stale:
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
    return removed


def scratch_root() -> str:
    """This process's scratch root (created on demand). The first call
    per process sweeps dead siblings — prune work rides on real use, so
    idle hosts pay nothing and no background daemon is needed."""
    global _pruned_this_process
    base = tempfile.gettempdir()
    if not _pruned_this_process:
        _pruned_this_process = True
        prune_dead_roots(base)
    root = os.path.join(base, f"{_PREFIX}{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return root


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under this process's root — the
    drop-in for ``tempfile.mkdtemp(prefix=...)`` at every operator
    spool site."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


def scratch_path(name: str) -> str:
    """A FIXED per-process path (not created) for reuse-and-reset
    sites: same process reuses one location instead of accumulating a
    copy per invocation; different processes can't collide because the
    root is per-PID."""
    return os.path.join(scratch_root(), name)
