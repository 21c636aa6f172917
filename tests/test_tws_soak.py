"""TWS soak: multiple distinct transformWithStateInPandas queries run
SERIALLY in ONE SparkSession on the RocksDB provider — the closest
local proxy to the driver's 50-row marathon where the r10 env crash
appeared (a TWS worker dying deep into a long session). This is the
regression net: all four state primitives (ValueState, event-time
timers, ListState, MapState) must complete back-to-back and agree
with their batch twins.
"""

from __future__ import annotations

import collections

import pytest

from farmrpg_etl_spark.streaming import ops, sessions, tws_ops
from farmrpg_etl_spark.streaming.chat_cdc import tws_available

SF = "/root/testdata/sf0.001"

def _restore(spark, prev):
    conf = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.unset(conf) if prev is None else spark.conf.set(conf, prev)


def test_tws_soak_four_primitives_one_session(spark):
    from farmrpg_etl_spark.queries import streaming_cdc_tws
    from farmrpg_etl_spark.sources.tables import load_table

    # gate AFTER the spark fixture: get_spark() enables the vendored
    # mini-protobuf runtime, so availability is only known here
    if not tws_available():
        pytest.skip("no protobuf runtime for the TWS protocol")
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    events = load_table(spark, SF, "events")
    try:
        # 1. ListState: first-seen dedup == DISTINCT (user, type)
        got = {
            (r.user_id, r.event_type)
            for r in ops.run_available_now(
                tws_ops.first_seen_types(ops.stream_events(spark, SF)),
                "append",
            ).collect()
        }
        exp = {
            (r.user_id, r.event_type)
            for r in events.select("user_id", "event_type")
            .distinct()
            .collect()
        }
        assert got == exp and len(got) > 0

        # 2. MapState: running ordinals == {1..n} per (user, type)
        got2 = collections.Counter(
            (r.user_id, r.event_type, r.n)
            for r in ops.run_available_now(
                tws_ops.running_type_counts(ops.stream_events(spark, SF)),
                "append",
            ).collect()
        )
        exp2 = collections.Counter(
            (r.user_id, r.event_type, i)
            for r in events.groupBy("user_id", "event_type")
            .count()
            .collect()
            for i in range(1, r["count"] + 1)
        )
        assert got2 == exp2

        # 3. ValueState + event-time timers: sessionization == batch twin
        got3 = {
            tuple(r)
            for r in ops.run_available_now(
                sessions.sessionize_with_timeout(
                    ops.stream_events(spark, SF)
                ),
                "append",
            ).collect()
        }
        exp3 = {
            tuple(r)
            for r in sessions.sessionize_with_timeout_batch(events).collect()
        }
        assert got3 == exp3 and len(got3) > 0

        # 4. ValueState CDC (the registry row end-to-end, incl. its own
        # conf save/restore) still completes after three TWS queries
        assert streaming_cdc_tws(spark, SF).count() > 0
    finally:
        _restore(spark, prev)
