"""Streaming chat CDC — D1's true stateful form (SURVEY §2.4).

``applyInPandasWithState`` keyed by (room, id), replicating the
reference's per-message state loop (scrapers/chat.py:158-171):

* state holds the last observed payload (content, flags, deleted,
  deleted_ts) per key;
* an incoming observation first inherits ``deleted_ts`` from state
  (carry-forward happens *before* the equality compare);
* it is emitted iff new-or-changed on any column except ``deleted_ts``;
* a deleted False→True flip stamps ``deleted_ts`` with the observation
  timestamp (``obs_ts`` — the poll's fetch time, never executor
  wall-clock, so retries are deterministic).

Scale: state is keyed by (room, id) — high-cardinality and uniform, so
the state store shards evenly across executors; each key's state is a
fixed-width row. The reference bounds state at ~100 messages/room by
wholesale payload replacement (scrapers/chat.py:171); here the bound
is a processing-time TTL (``state_ttl_ms``): a key idle longer than
the TTL is EVICTED (``state.remove()`` on the timeout callback), so
the store holds only recently-observed messages — the streaming
equivalent of the reference's FIFO horizon. An infinite stream with
``NoTimeout`` is a slow state leak; pass a TTL in production.

Divergence semantics under eviction exactly match the reference's
documented behavior: a message that drops out of the payload longer
than the horizon and then REAPPEARS unchanged re-emits as new (the
reference re-emits in that case too, because its per-poll state was
replaced; see the reappear note in ``operators.cdc.message_cdc``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHAT_CDC_OUTPUT = StructType(
    [
        StructField("room", StringType(), False),
        StructField("id", StringType(), False),
        StructField("obs_ts", TimestampType(), False),
        StructField("ts", TimestampType(), True),
        StructField("username", StringType(), True),
        StructField("content", StringType(), True),
        StructField("flags", IntegerType(), True),
        StructField("deleted", BooleanType(), True),
        StructField("deleted_ts", TimestampType(), True),
    ]
)

# state: last observed payload per (room, id)
CHAT_CDC_STATE = StructType(
    [
        StructField("content", StringType(), True),
        StructField("flags", IntegerType(), True),
        StructField("deleted", BooleanType(), True),
        StructField("deleted_ts", TimestampType(), True),
        StructField("ts", TimestampType(), True),
        StructField("username", StringType(), True),
    ]
)


def _make_chat_cdc_fn(state_ttl_ms: int | None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past the TTL with no new observations: evict. The
            # key's next appearance starts stateless and re-emits.
            state.remove()
            return
        yield from _chat_cdc_fn(key, pdfs, state)
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    return fn


def _cdc_core(
    room: Any,
    msg_id: Any,
    prior: tuple | None,
    pdfs: Iterator[pd.DataFrame],
) -> tuple[list[dict], tuple]:
    """The CDC transition function, pure of any state-store API: fold
    the batch's observations for one (room, id) over the prior state
    tuple; return (emitted change rows, new state tuple). Shared by
    BOTH stateful-streaming backends (``applyInPandasWithState`` and
    ``transformWithStateInPandas``) so their semantics cannot drift —
    the equivalence test pins them to the same oracle."""
    if prior is not None:
        content, flags, deleted, deleted_ts, ts, username = prior
        has_state = True
    else:
        content = flags = deleted = deleted_ts = ts = username = None
        has_state = False
    out: list[dict] = []
    batch = [pdf for pdf in pdfs if len(pdf)]
    if batch:
        # one global (obs_ts, pos) order across the batch's chunks —
        # Arrow may deliver a key's rows as several DataFrames
        whole = batch[0] if len(batch) == 1 else pd.concat(batch)
        # rows tied on (obs_ts, pos) must fold in their arrival order
        # on every run/backend; multi-column sort_values always uses a
        # stable lexsort (kind= is applied only for single-column
        # sorts), so stability already holds — kind="stable" is kept
        # purely as documentation of that requirement
        whole = whole.sort_values(["obs_ts", "pos"], kind="stable")
        for r in whole.itertuples(index=False):
            raw_dts = getattr(r, "deleted_ts", None)  # input col is optional
            r_deleted_ts = None if raw_dts is None or pd.isna(raw_dts) else raw_dts
            # carry deleted_ts forward from state before comparing
            if has_state and deleted_ts is not None and r_deleted_ts is None:
                r_deleted_ts = deleted_ts
            changed = (not has_state) or (
                (r.content, r.flags, bool(r.deleted), r.ts, r.username)
                != (content, flags, bool(deleted), ts, username)
            )
            if changed:
                if has_state and not deleted and bool(r.deleted):
                    r_deleted_ts = r.obs_ts  # stamp the flip (re-delete re-stamps)
                out.append(
                    {
                        "room": room,
                        "id": msg_id,
                        "obs_ts": r.obs_ts,
                        "ts": r.ts,
                        "username": r.username,
                        "content": r.content,
                        "flags": r.flags,
                        "deleted": bool(r.deleted),
                        "deleted_ts": r_deleted_ts,
                    }
                )
            content, flags, deleted = r.content, r.flags, bool(r.deleted)
            deleted_ts, ts, username = r_deleted_ts, r.ts, r.username
            has_state = True
    return out, (content, flags, deleted, deleted_ts, ts, username)


def _chat_cdc_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    room, msg_id = key
    prior = tuple(state.get) if state.exists else None
    out, new_state = _cdc_core(room, msg_id, prior, pdfs)
    state.update(new_state)
    if out:
        yield pd.DataFrame(out)


class ChatCdcProcessor(StatefulProcessor):
    """``StatefulProcessor`` backend for the same CDC semantics on the
    Spark 4 ``transformWithStateInPandas`` API (SURVEY §2.4 names both
    forms; r5 verdict next-item #6). State is a single ``ValueState``
    row per (room, id) with the SAME schema as the legacy form, and
    the transition is the SHARED ``_cdc_core`` — the two backends
    cannot diverge without the equivalence test failing.

    TTL eviction is first-class here: ``getValueState(...,
    ttlDurationMs=...)`` expires idle values in the store itself — no
    hand-rolled timeout callback, and eviction keeps working under
    future multi-state extensions (the API's point). A module-level
    class: the processor ships to the TWS worker pickled, so it must
    be importable by reference."""

    def __init__(self, state_ttl_ms: int | None):
        self._ttl = state_ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "chat_state", CHAT_CDC_STATE, ttlDurationMs=self._ttl
        )

    def handleInputRows(self, key, rows, timerValues):
        room, msg_id = key
        prior = tuple(self._state.get()) if self._state.exists() else None
        out, new_state = _cdc_core(room, msg_id, prior, rows)
        self._state.update(new_state)
        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """Whether the ``transformWithStateInPandas`` Python worker can run
    here: its state protocol is protobuf-based
    (``pyspark.sql.streaming.proto.StateMessage_pb2``), so a container
    without the ``protobuf`` package crashes the TWS driver worker at
    query start. Real Spark deployments ship protobuf; this probe
    exists for minimal containers (like the test one)."""
    try:
        import google.protobuf.descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def chat_cdc_stream_tws(
    observations: DataFrame, state_ttl_ms: int | None = 3_600_000
) -> DataFrame:
    """`chat_cdc_stream` on the ``transformWithStateInPandas`` backend
    — same input contract, same output schema, same transition
    function; see :class:`ChatCdcProcessor`. Requires the RocksDB
    state-store provider (set here; the conf is read at query start)
    and the protobuf state protocol (:func:`tws_available` — raises
    up-front with a clear message instead of crashing the TWS worker
    mid-query).

    At 100 TB the TWS form is the forward path: RocksDB state scales
    past executor heap, TTL is enforced inside the store, and the
    processor model composes additional state (e.g. a per-room mention
    index as ListState) without re-keying the stream."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for "
            "its state protocol; install protobuf or use "
            "chat_cdc_stream (applyInPandasWithState) — same semantics "
            "via the shared _cdc_core transition."
        )
    proc = ChatCdcProcessor(state_ttl_ms)
    observations.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return observations.groupBy("room", "id").transformWithStateInPandas(
        proc,
        CHAT_CDC_OUTPUT,
        "append",
        "ProcessingTime" if state_ttl_ms is not None else "None",
    )


def chat_cdc_stream(
    observations: DataFrame, state_ttl_ms: int | None = 3_600_000
) -> DataFrame:
    """Apply streaming message CDC to an observation stream with columns
    (room, id, obs_ts, pos, ts, username, content, flags, deleted,
    deleted_ts).

    ``state_ttl_ms`` bounds the state store: keys idle longer than the
    TTL are evicted (default 1 h — generous vs the reference's ~100
    msgs/room FIFO horizon at ≤1 msg/s/room). ``None`` disables
    eviction (bounded back-tests only — never on an infinite stream).
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        observations.groupBy("room", "id")
        .applyInPandasWithState(
            _make_chat_cdc_fn(state_ttl_ms),
            CHAT_CDC_OUTPUT,
            CHAT_CDC_STATE,
            "append",
            timeout,
        )
    )
