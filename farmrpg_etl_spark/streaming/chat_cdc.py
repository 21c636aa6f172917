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


def _chat_cdc_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    room, msg_id = key
    if state.exists:
        content, flags, deleted, deleted_ts, ts, username = state.get
        has_state = True
    else:
        content = flags = deleted = deleted_ts = ts = username = None
        has_state = False
    out: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["obs_ts", "pos"])
        for r in pdf.itertuples(index=False):
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
    state.update((content, flags, deleted, deleted_ts, ts, username))
    if out:
        yield pd.DataFrame(out)


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
