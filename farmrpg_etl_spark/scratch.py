"""Process-scoped scratch-directory manager.

Registry rows that exercise sinks or streaming sources need real
on-disk locations (a ParquetTable root, a file-stream source dir, a
sqlite db). Those rows return DataFrames that READ from the scratch
location lazily — the caller (driver, checker, pytest) collects them
at some later point in the process — so per-row ``try/finally``
deletion would yank the files out from under the returned plan. The
correct lifetime is the PROCESS: every dir is registered here and
swept by one ``atexit`` hook, so a full verify marathon no longer
leaves dozens of ``/tmp/farmrpg_*`` dirs behind (r14 verdict #5; the
same leak class as the r13-fixed robots-bodies cache).

The sweep is plain ``shutil.rmtree`` — it needs nothing from Spark,
so atexit ordering relative to JVM shutdown is irrelevant.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []
_REAPED = False

# deliberate long-lived caches (bench.py's synthesized stretch tables)
# share the farmrpg_ prefix but must survive the reaper
_KEEP_GLOBS = ("farmrpg_sf*_synth",)

_PID_MARKER = ".farmrpg_owner_pid"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # alive, different user
    except OSError:
        return True  # unknown — keep, never delete on doubt
    return True


def _reap_stale() -> int:
    """Remove ``farmrpg_*`` scratch dirs stranded by HARD-KILLED
    processes (r15 verdict #3: the driver SIGKILLs its correctness
    run, so atexit never fires and that run's dirs survive). Every
    dir made by :func:`scratch_dir` carries a ``.farmrpg_owner_pid``
    marker; at the first ``scratch_dir`` call of a new process any
    marked dir whose owner pid is dead is reaped, as is any UNMARKED
    ``farmrpg_*`` dir (pre-marker strays — nothing current creates
    one). Deliberate caches in ``_KEEP_GLOBS`` are exempt. Runs once
    per process, best-effort (a dir that vanishes mid-scan is fine)."""
    tmp = tempfile.gettempdir()
    keep = set()
    for g in _KEEP_GLOBS:
        keep.update(glob.glob(os.path.join(tmp, g)))
    n = 0
    for d in glob.glob(os.path.join(tmp, "farmrpg_*")):
        if d in keep or not os.path.isdir(d):
            continue
        marker = os.path.join(d, _PID_MARKER)
        try:
            pid = int(open(marker).read())
        except (OSError, ValueError):
            pid = None  # unmarked stray from a pre-marker run
        if pid is not None and (pid == os.getpid() or _pid_alive(pid)):
            continue
        shutil.rmtree(d, ignore_errors=True)
        n += 1
    return n


def scratch_dir(prefix: str) -> str:
    """``mkdtemp`` with the repo's ``farmrpg_`` prefix, registered for
    the process-exit sweep and stamped with the owner pid so the NEXT
    process can reap it if this one is hard-killed. All registry
    scratch (sink roots, stream source dirs, sqlite stores, iteration
    checkpoint dirs) goes through here."""
    global _REAPED
    if not _REAPED:
        _REAPED = True
        _reap_stale()
    d = tempfile.mkdtemp(prefix=f"farmrpg_{prefix}_")
    with open(os.path.join(d, _PID_MARKER), "w") as f:
        f.write(str(os.getpid()))
    _SCRATCH_DIRS.append(d)
    return d


def sweep() -> int:
    """Remove every registered dir (idempotent; missing dirs are
    fine). Returns the number of dirs swept. Exposed for tests;
    normally runs via atexit."""
    n = 0
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
        n += 1
    return n


atexit.register(sweep)
