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
