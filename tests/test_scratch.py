"""Process-scoped scratch lifecycle (r14 verdict #5: a verify
marathon must not leave /tmp littered with farmrpg_* dirs)."""

import os

from farmrpg_etl_spark import scratch


def test_scratch_dirs_registered_and_swept():
    # isolate from the shared pytest process: sweeping the GLOBAL
    # registry here would delete sink/checkpoint dirs other tests'
    # returned DataFrames still read lazily (review r15)
    saved = scratch._SCRATCH_DIRS[:]
    del scratch._SCRATCH_DIRS[:]
    try:
        d1 = scratch.scratch_dir("testrow")
        d2 = scratch.scratch_dir("sink_testrow")
        assert os.path.isdir(d1) and os.path.isdir(d2)
        assert os.path.basename(d1).startswith("farmrpg_testrow_")
        # a populated dir is removed too (the sink case: parquet under it)
        open(os.path.join(d2, "part-0.parquet"), "w").write("x")
        n = scratch.sweep()
        assert n == 2
        assert not os.path.exists(d1) and not os.path.exists(d2)
        # idempotent: a second sweep has nothing to do
        assert scratch.sweep() == 0
    finally:
        scratch._SCRATCH_DIRS.extend(saved)


def test_all_registry_scratch_routes_through_manager():
    """No registry code may mkdtemp directly — every scratch dir must
    be registered for the atexit sweep."""
    import farmrpg_etl_spark.operators.iterate as it
    import farmrpg_etl_spark.queries as Q

    for mod in (Q, it):
        assert "mkdtemp" not in open(mod.__file__).read(), mod.__name__


def test_reaper_removes_dead_owner_and_unmarked_dirs():
    """Hard-killed processes never run atexit (r15 verdict #3: the
    driver's SIGKILLed run stranded 4 dirs). The start-of-session
    reaper removes dirs whose owner pid is dead and unmarked strays,
    keeps live-owner dirs and the deliberate _KEEP_GLOBS caches."""
    import subprocess
    import tempfile

    tmp = tempfile.gettempdir()

    def mk(name, pid=None):
        d = tempfile.mkdtemp(prefix=f"farmrpg_{name}_", dir=tmp)
        if pid is not None:
            with open(os.path.join(d, scratch._PID_MARKER), "w") as f:
                f.write(str(pid))
        return d

    # a real dead pid: spawn-and-wait a child so the pid existed
    p = subprocess.Popen(["true"])
    p.wait()
    dead = mk("reaptest_dead", p.pid)
    unmarked = mk("reaptest_stray")
    live = mk("reaptest_live", os.getpid())
    keep = os.path.join(tmp, "farmrpg_sf99_synth")
    os.makedirs(keep, exist_ok=True)
    try:
        scratch._reap_stale()
        assert not os.path.exists(dead)
        assert not os.path.exists(unmarked)
        assert os.path.exists(live)
        assert os.path.exists(keep)
    finally:
        for d in (live, keep, dead, unmarked):
            if os.path.exists(d):
                import shutil

                shutil.rmtree(d, ignore_errors=True)


def test_scratch_dir_stamps_owner_pid():
    saved = scratch._SCRATCH_DIRS[:]
    del scratch._SCRATCH_DIRS[:]
    try:
        d = scratch.scratch_dir("pidstamp")
        marker = os.path.join(d, scratch._PID_MARKER)
        assert int(open(marker).read()) == os.getpid()
        scratch.sweep()
    finally:
        scratch._SCRATCH_DIRS.extend(saved)
