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
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """``mkdtemp`` with the repo's ``farmrpg_`` prefix, registered for
    the process-exit sweep. All registry scratch (sink roots, stream
    source dirs, sqlite stores, iteration checkpoint dirs) goes
    through here."""
    d = tempfile.mkdtemp(prefix=f"farmrpg_{prefix}_")
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
