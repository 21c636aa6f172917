"""Tests for timeout-emitting TWS sessionization
(`streaming/sessions.py`) — inline close on successor, event-time
timer close at the watermark, exact boundary semantics, and
open-session withholding."""

from __future__ import annotations

from datetime import datetime

from farmrpg_etl_spark.streaming.ops import run_available_now
from farmrpg_etl_spark.streaming.sessions import sessionize_with_timeout

SCHEMA = "user_id long, ts timestamp, event_id long"


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


_RUN_SEQ = [0]


def _run(spark, tmp_path, files, **kw):
    _RUN_SEQ[0] += 1
    d = str(tmp_path / f"events_src_{_RUN_SEQ[0]}")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    try:
        out = run_available_now(sessionize_with_timeout(sdf, **kw), "append")
    finally:  # shared session fixture: don't leak the RocksDB provider
        spark.conf.unset(conf) if prev is None else spark.conf.set(conf, prev)
    return {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in out.collect()
    }


def test_inline_close_on_successor(spark, tmp_path):
    """A successor event past the gap closes the previous session in
    the same batch, no timer involvement."""
    got = _run(
        spark, tmp_path,
        [[
            (1, _t("2024-06-01 10:00:00"), 1),
            (1, _t("2024-06-01 10:05:00"), 2),
            (1, _t("2024-06-01 11:00:00"), 3),  # 55 min gap: closes s1
            (1, _t("2024-06-01 13:00:00"), 4),  # closes s2; s3 stays open
        ]],
    )
    assert got[(1, _t("2024-06-01 10:00:00"))] == (_t("2024-06-01 10:35:00"), 2)
    assert got[(1, _t("2024-06-01 11:00:00"))] == (_t("2024-06-01 11:30:00"), 1)
    # the 13:00 session is open: its expiry 13:30 > final watermark 13:00
    assert len(got) == 2


def test_timer_fires_at_exact_watermark_boundary(spark, tmp_path):
    """watermark >= expiry: a session whose last_ts+gap EQUALS the
    final watermark is emitted by its timer (pins the oracle's <=)."""
    got = _run(
        spark, tmp_path,
        [
            [(1, _t("2024-06-01 10:00:00"), 1),
             (1, _t("2024-06-01 10:10:00"), 2)],
            [(2, _t("2024-06-01 10:40:00"), 3)],  # watermark -> exactly 10:40
        ],
    )
    assert got == {
        (1, _t("2024-06-01 10:00:00")): (_t("2024-06-01 10:40:00"), 2),
    }


def test_timer_moves_as_session_extends(spark, tmp_path):
    """An extension in a later batch must re-register the timer: the
    session emits with the EXTENDED end, once."""
    got = _run(
        spark, tmp_path,
        [
            [(1, _t("2024-06-01 10:00:00"), 1)],
            [(1, _t("2024-06-01 10:20:00"), 2)],   # extends: expiry 10:50
            [(2, _t("2024-06-01 12:00:00"), 3)],   # watermark passes 10:50
        ],
    )
    assert got == {
        (1, _t("2024-06-01 10:00:00")): (_t("2024-06-01 10:50:00"), 2),
    }


def test_exact_gap_starts_new_session(spark, tmp_path):
    """>= gap convention (same as streaming_sessionize): an event
    exactly 30 minutes after the last starts a NEW session."""
    got = _run(
        spark, tmp_path,
        [
            [(1, _t("2024-06-01 10:00:00"), 1),
             (1, _t("2024-06-01 10:30:00"), 2)],
            [(2, _t("2024-06-01 12:00:00"), 3)],
        ],
    )
    assert got[(1, _t("2024-06-01 10:00:00"))] == (_t("2024-06-01 10:30:00"), 1)
    assert got[(1, _t("2024-06-01 10:30:00"))] == (_t("2024-06-01 11:00:00"), 1)


def test_state_survives_batches_within_gap(spark, tmp_path):
    """Events split across batches but within the gap merge into one
    session with the right census."""
    got = _run(
        spark, tmp_path,
        [
            [(1, _t("2024-06-01 10:00:00"), 1)],
            [(1, _t("2024-06-01 10:10:00"), 2),
             (1, _t("2024-06-01 10:12:00"), 3)],
            [(1, _t("2024-06-01 23:00:00"), 4)],  # closes inline
        ],
    )
    assert got[(1, _t("2024-06-01 10:00:00"))] == (_t("2024-06-01 10:42:00"), 3)


def test_ms_quantized_timer_boundary_sub_ms(spark, tmp_path):
    """Spark timers/watermarks are ms-quantized; splitting stays
    µs-exact. expiry = ceil_ms(end_us): end 10:40:00.000500 fires
    under watermark floor_ms(10:40:00.001700) but is withheld under
    floor_ms(10:40:00.000900) — the oracle's integer predicate."""
    base = [(1, _t("2024-06-01 10:10:00.000500"), 1)]
    fires = _run(spark, tmp_path, [base, [(2, _t("2024-06-01 10:40:00.001700"), 2)]])
    assert (1, _t("2024-06-01 10:10:00.000500")) in fires
    withheld = _run(spark, tmp_path, [base, [(2, _t("2024-06-01 10:40:00.000900"), 2)]])
    assert withheld == {}


def test_batch_twin_matches_tws_on_real_table(spark):
    """sessionize_with_timeout_batch (the runtime-crash fallback) must
    be row-identical to the TWS streaming run on the real events
    table — the equivalence that makes the fallback sound under the
    SAME driver oracle."""
    from farmrpg_etl_spark.queries import streaming_session_timeout
    from farmrpg_etl_spark.sources.tables import load_table
    from farmrpg_etl_spark.streaming.sessions import (
        sessionize_with_timeout_batch,
    )

    sf = "/root/testdata/sf0.001"
    tws = {tuple(r) for r in streaming_session_timeout(spark, sf).collect()}
    batch = {
        tuple(r)
        for r in sessionize_with_timeout_batch(
            load_table(spark, sf, "events")
        ).collect()
    }
    assert tws == batch
    assert len(tws) > 0


def test_registry_row_survives_tws_crash(spark, monkeypatch):
    """If the TWS path dies at runtime (the r10 driver's one red row),
    the registry row must degrade to the batch twin instead of
    erroring — same rows, same schema."""
    import farmrpg_etl_spark.streaming.sessions as sessions_mod
    from farmrpg_etl_spark.queries import streaming_session_timeout
    from farmrpg_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    expected = {
        tuple(r)
        for r in sessions_mod.sessionize_with_timeout_batch(
            load_table(spark, sf, "events")
        ).collect()
    }

    def _boom(*a, **k):
        raise RuntimeError(
            "TransformWithStateInPySpark driver worker exited unexpectedly"
        )

    monkeypatch.setattr(sessions_mod, "sessionize_with_timeout", _boom)
    out = streaming_session_timeout(spark, sf)
    assert [f.name for f in out.schema.fields] == [
        "user_id", "session_start", "session_end", "n_events",
    ]
    assert {tuple(r) for r in out.collect()} == expected


def test_registry_row_reraises_processor_bugs(spark, monkeypatch):
    """The batch fallback is for ENVIRONMENT death only (r12 advice
    #1): a plan error (AnalysisException), a processor bug surfaced as
    a PythonException, a relayed Python traceback, and a runtime
    failure that merely NAMES the TWS operator must all propagate —
    otherwise the row re-runs the oracle against itself and passes
    green with a broken feature."""
    import pytest
    from pyspark.errors import AnalysisException, PythonException

    import farmrpg_etl_spark.streaming.sessions as sessions_mod
    from farmrpg_etl_spark.queries import streaming_session_timeout

    sf = "/root/testdata/sf0.001"

    def _raises(exc):
        def _boom(*a, **k):
            raise exc
        return _boom

    # plan bug
    monkeypatch.setattr(
        sessions_mod, "sessionize_with_timeout",
        _raises(AnalysisException("[UNRESOLVED_COLUMN] bad plan")),
    )
    with pytest.raises(AnalysisException):
        streaming_session_timeout(spark, sf)

    # processor bug surfaced as PythonException — even when the
    # message carries the TWS operator name + a worker-death marker
    monkeypatch.setattr(
        sessions_mod, "sessionize_with_timeout",
        _raises(PythonException(
            "TransformWithStateInPySpark failed: "
            "Python worker exited unexpectedly"
        )),
    )
    with pytest.raises(PythonException):
        streaming_session_timeout(spark, sf)

    # processor TypeError relayed as chain text with a Python traceback
    monkeypatch.setattr(
        sessions_mod, "sessionize_with_timeout",
        _raises(RuntimeError(
            "Python worker exited unexpectedly\n"
            "Traceback (most recent call last):\n"
            '  File "tws_ops.py", line 60, in handleInputRows\n'
            "TypeError: unsupported operand type(s)"
        )),
    )
    with pytest.raises(RuntimeError):
        streaming_session_timeout(spark, sf)

    # operator name ALONE is not a death marker anymore
    monkeypatch.setattr(
        sessions_mod, "sessionize_with_timeout",
        _raises(RuntimeError("TransformWithStateInPySpark query failed")),
    )
    with pytest.raises(RuntimeError):
        streaming_session_timeout(spark, sf)
