"""Timeout-emitting streaming sessionization on transformWithStateInPandas
event-time timers — the operator family the vendored mini-protobuf
runtime unlocked (timers were gated until r10).

``session_window`` (streaming/ops.streaming_sessionize) merges windows
but only exposes aggregates Catalyst can express; this processor owns
the per-user session record, so it can carry arbitrary payloads and —
the part no window aggregate gives you — EMIT EACH SESSION EXACTLY
WHEN IT PROVABLY CLOSES: inline when a successor event arrives past
the gap, or from an event-time TIMER when the watermark passes
``last_ts + gap`` with no successor. Open sessions are withheld
(same contract as the watermarked window rows: nothing is emitted
that a late event could still extend).

Timer-boundary semantics, pinned by tests/test_tws_sessions.py:
session SPLITTING is microsecond-exact (gap compared in µs, identical
to the batch lag oracle), but Spark timers and watermarks are
millisecond-quantized (watermark = floor_ms(max event time); a timer
fires once watermark_ms >= expiry_ms). The processor registers
``expiry_ms = ceil_ms(last_us + gap_us)`` — never early — so the
tail-session emission predicate is exactly
``ceil_ms(session_end) <= floor_ms(max(ts))``, which the oracle
states verbatim in integer arithmetic.

Scale notes (100 TB): state is ONE fixed-width row per open session
per user (RocksDB-backed, beyond-heap), timers are one per user, and
emission is incremental — no complete-mode re-emission of the whole
result every batch, which is what makes this form deployable where
``streaming_sessionize``'s complete-mode twin is not. The per-batch
sort is per-user within the Arrow batch (bounded by a user's events
in one trigger), never a global sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

SESSION_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, timer_ms bigint"


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


class SessionTimeoutProcessor(StatefulProcessor):
    """Per-user open-session record + one event-time timer at
    ``last_ts + gap``; see module docstring for emission contract."""

    def __init__(self, gap_us: int = 1_800_000_000):
        self._gap = gap_us

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", _STATE_SCHEMA)

    def _emit(self, user_id: int, st: tuple) -> pd.DataFrame:
        start_us, last_us, n, _ = st
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us + self._gap, unit="us")],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        st = tuple(self._state.get()) if self._state.exists() else None
        old_timer = st[3] if st is not None else -1
        events = []
        for pdf in rows:
            events.extend(zip(pdf["ts"], pdf["event_id"]))
        events.sort(key=lambda e: (_us(e[0]), int(e[1])))
        for ts, _ in events:
            ev = _us(ts)
            if st is None:
                st = (ev, ev, 1, -1)
            elif ev - st[1] >= self._gap:  # gap reached: session closed
                yield self._emit(user_id, st)
                st = (ev, ev, 1, -1)
            else:
                st = (st[0], max(st[1], ev), st[2] + 1, st[3])
        if st is None:  # empty batch for an unseen key: nothing to do
            return
        # ceil to ms: Spark timers are ms-based; never fire early
        expiry = (st[1] + self._gap + 999) // 1000
        self._state.update((st[0], st[1], st[2], expiry))
        if old_timer >= 0 and old_timer != expiry:
            self._handle.deleteTimer(old_timer)
        if old_timer != expiry:
            self._handle.registerTimer(expiry)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self._state.exists():
            return
        st = tuple(self._state.get())
        if st[3] == expiredTimerInfo.getExpiryTimeInMs():
            yield self._emit(key[0], st)
            self._state.clear()

    def close(self) -> None:
        pass


def sessionize_with_timeout_batch(
    events: DataFrame, gap_us: int = 1_800_000_000
) -> DataFrame:
    """Batch twin of :func:`sessionize_with_timeout` — the identical
    emission contract expressed in pure DataFrame ops (lag → gap flag →
    running-sum session id → per-session agg → closed-session filter
    with the ms-quantized tail predicate). Used as the RUNTIME crash
    fallback when the TWS driver worker dies in a constrained
    environment (the r10 driver observed a one-off
    ``TransformWithStateInPySpark driver worker exited unexpectedly``
    that never reproduced locally): same inputs, same oracle, same
    rows — the TWS path is the deployable streaming form, this is the
    provably-equivalent batch plan.

    Scale: the only shuffles are the per-user window partitioning and
    the (user, session) aggregation — both on the high-cardinality
    uniform user key; the global max-ts is a 1-row broadcast, never a
    driver collect.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    sid = (
        events.select("user_id", "ts", "event_id")
        .withColumn(
            "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        )
        .withColumn(
            "ns",
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") >= gap_us), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    a = sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        (F.max(F.unix_micros("ts")) + F.lit(gap_us)).alias("end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    # tail detection reuses the per-user partitioning (window max, no
    # extra join); the global max-ts is a 1-row broadcast
    a = a.withColumn(
        "max_sid", F.max("session_id").over(Window.partitionBy("user_id"))
    )
    global_max = events.agg(F.max(F.unix_micros("ts")).alias("max_us"))
    return (
        a.crossJoin(F.broadcast(global_max))
        .filter(
            (F.col("session_id") < F.col("max_sid"))
            | (
                F.expr("(end_us + 999) DIV 1000")
                <= F.expr("max_us DIV 1000")
            )
        )
        .select(
            "user_id",
            "session_start",
            F.timestamp_micros("end_us").alias("session_end"),
            "n_events",
        )
    )


def sessionize_with_timeout(
    events: DataFrame,
    gap_us: int = 1_800_000_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Wire the processor: watermark on ``ts`` (event-time timers need
    one), group by user, RocksDB provider for beyond-heap state.

    NOTE: TWS requires the RocksDB state-store provider, and the conf
    is session-wide and read at QUERY START — so it must still be set
    when the caller starts the query and cannot be restored here.
    Callers running other streaming queries afterwards should
    save/restore ``spark.sql.streaming.stateStore.providerClass``
    around the bounded run (see the ``streaming_session_timeout``
    registry row)."""
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "event_id")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionTimeoutProcessor(gap_us), SESSION_OUTPUT, "append",
            "EventTime",
        )
    )
