"""ListState / MapState transformWithStateInPandas operators.

The r10 round un-gated the real TWS backend (vendored mini-protobuf
runtime); chat CDC uses ValueState and the session operator adds
event-time timers. This module exercises the remaining two state
primitives of the TWS API — ``ListState`` and ``MapState`` — with
operators whose OUTPUT IS A SET independent of micro-batch
composition, so the driver can hash-compare them against batch SQL
oracles:

- :class:`FirstSeenProcessor` (ListState): per-user list of event
  types already seen; a (user, type) row is emitted exactly once —
  when that type first appears for that user. Output = the distinct
  (user_id, event_type) set, whatever the batching. This is the
  reference's FIFO seen-cache shape (``utils/cache.py:7-17``,
  scrapers/mailbox.py) carried per-key in beyond-heap state instead
  of process memory.

- :class:`RunningCountProcessor` (MapState): per-user map
  event_type → count; each event emits its own running ordinal.
  The emitted multiset for a (user, type) with n events is exactly
  {1..n} regardless of arrival order or batch splits — order-free by
  construction, and the batch oracle is a generate_series expansion
  of the grouped counts.

Scale notes (100 TB): state is keyed by the high-cardinality uniform
user_id so RocksDB shards evenly; ListState holds at most
|event_type| entries per user (bounded vocabulary), MapState the same
— both O(1) per user, never per-event growth. Emission is incremental
append — no complete-mode re-emission.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

FIRST_SEEN_OUTPUT = "user_id bigint, event_type string"
RUNNING_COUNT_OUTPUT = "user_id bigint, event_type string, n bigint"

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class FirstSeenProcessor(StatefulProcessor):
    """Emit (user_id, event_type) on FIRST sight per user — ListState
    as a per-key membership set (append-only, bounded by the type
    vocabulary)."""

    def init(self, handle) -> None:
        self._seen = handle.getListState("seen_types", "t string")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        seen = {r[0] for r in self._seen.get()}
        fresh: list[str] = []
        for pdf in rows:
            for t in pdf["event_type"]:
                t = str(t)
                if t not in seen:
                    seen.add(t)
                    fresh.append(t)
        if fresh:
            self._seen.appendList([(t,) for t in fresh])
            yield pd.DataFrame(
                {"user_id": [user_id] * len(fresh), "event_type": fresh}
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


class RunningCountProcessor(StatefulProcessor):
    """Emit each event's per-(user, type) running ordinal — MapState
    keyed by event_type. The output multiset is batching-invariant:
    {(u, t, i) | 1 <= i <= count(u, t)}."""

    def init(self, handle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "t string", "n bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        # preload this user's whole map in one state-server round trip
        # (getValue per unseen key costs an RPC and a JVM warn each;
        # the map is bounded by the type vocabulary)
        local: dict[str, int] = {
            k[0]: int(v[0]) for k, v in self._counts.iterator()
        }
        out_t: list[str] = []
        out_n: list[int] = []
        touched: set[str] = set()
        for pdf in rows:
            for t in pdf["event_type"]:
                t = str(t)
                local[t] = local.get(t, 0) + 1
                touched.add(t)
                out_t.append(t)
                out_n.append(local[t])
        for t in touched:
            self._counts.updateValue((t,), (local[t],))
        if out_t:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_t),
                    "event_type": out_t,
                    "n": out_n,
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def _tws(events: DataFrame, proc, output_schema: str) -> DataFrame:
    """Common wiring: RocksDB provider (required by TWS, read at query
    start — callers save/restore the conf around the bounded run) and
    a per-user grouping."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
    )
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(proc, output_schema, "append", "None")
    )


def first_seen_types(events: DataFrame) -> DataFrame:
    return _tws(events, FirstSeenProcessor(), FIRST_SEEN_OUTPUT)


def running_type_counts(events: DataFrame) -> DataFrame:
    return _tws(events, RunningCountProcessor(), RUNNING_COUNT_OUTPUT)
