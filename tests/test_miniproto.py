"""Tests for the vendored mini protobuf runtime
(`farmrpg_etl_spark/vendor/google/protobuf`) and the full TWS state
protocol it unlocks.

The wire-format tests pin hand-computed byte strings from the public
protobuf encoding spec; the e2e test is the authoritative check — a
``transformWithStateInPandas`` query whose every state interaction
(value/list/map state, TTL config, timers, map iteration) crosses the
Python<->JVM socket as proto messages encoded by the mini runtime and
decoded by the JVM's REAL protobuf (and vice versa).
"""

from __future__ import annotations

import os
import sys

import pytest

from farmrpg_etl_spark.vendor import _VENDOR_DIR, enable_miniproto

enable_miniproto()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


# --------------------------------------------------------------------------
# wire format units
# --------------------------------------------------------------------------

def test_golden_bytes_nested_oneof():
    """Hand-computed encoding: StateRequest{version=2,
    statefulProcessorCall{getValueState{stateName="s", ttl{durationMs=5000}}}}."""
    cmd = sm.StateCallCommand(stateName="s")
    cmd.ttl.durationMs = 5000
    req = sm.StateRequest(
        version=2, statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    # field1 varint 2 | field2 LEN { field2 LEN { field1 LEN "s" |
    #   field4 LEN { field1 varint 5000 } } }
    assert req.SerializeToString() == bytes.fromhex(
        "0802120a12080a01732203088827"
    )


def test_varint_boundaries_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -(2**63)):
        m = sm.RegisterTimer(expiryTimestampMs=v)
        back = sm.RegisterTimer()
        back.ParseFromString(m.SerializeToString())
        assert back.expiryTimestampMs == v, v


def test_proto3_implicit_presence_skips_defaults():
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"") \
        .SerializeToString() == b""
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_oneof_set_clears_siblings():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(),
    )
    assert req.HasField("statefulProcessorCall")
    req.timerRequest = sm.TimerRequest()
    assert not req.HasField("statefulProcessorCall")
    assert req.HasField("timerRequest")


def test_proto3_optional_serializes_default():
    """TimerInfo.key is `optional bytes`: explicit presence means an
    empty key still hits the wire (field1 LEN 0)."""
    assert sm.TimerInfo(key=b"").SerializeToString() == b"\x0a\x00"
    t = sm.TimerInfo()
    t.ParseFromString(b"\x10\x7b")  # only timestampMs=123
    assert t.timestampMs == 123 and not t.HasField("key") and t.key == b""


def test_repeated_bytes_and_messages():
    lst = sm.AppendList(value=[b"a", b"", b"ccc"], fetchWithArrow=True)
    back = sm.AppendList()
    back.ParseFromString(lst.SerializeToString())
    assert back.value == [b"a", b"", b"ccc"] and back.fetchWithArrow is True

    resp = sm.StateResponseWithMapIterator(statusCode=0)
    resp.kvPair.append(sm.KeyAndValuePair(key=b"k1", value=b"v1"))
    resp.kvPair.append(sm.KeyAndValuePair(key=b"k2", value=b"v2"))
    resp.requireNextFetch = True
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")
    ]
    assert back2.requireNextFetch is True


def test_unknown_fields_skipped():
    # field 15 varint 7 (unknown to StateResponse) + field 1 varint 3
    m = sm.StateResponse()
    m.ParseFromString(b"\x78\x07\x08\x03")
    assert m.statusCode == 3


def test_utf8_string_roundtrip():
    m = sm.ParseStringSchema(schema="naïve ☃ schéma")
    back = sm.ParseStringSchema()
    back.ParseFromString(m.SerializeToString())
    assert back.schema == "naïve ☃ schéma"


def test_unset_message_field_reads_vivify_only_locally():
    cmd = sm.StateCallCommand(stateName="x")
    before = cmd.SerializeToString()
    assert b"x" in before
    # enum module constants exported like generated code
    assert (sm.PRE_INIT, sm.CLOSED) == (0, 5)


def test_enable_is_idempotent_and_appended_once():
    enable_miniproto()
    enable_miniproto()
    assert sys.path.count(_VENDOR_DIR) == 1
    assert os.environ["PYTHONPATH"].split(os.pathsep).count(_VENDOR_DIR) == 1


# --------------------------------------------------------------------------
# end-to-end: the full state protocol over the real JVM socket
# --------------------------------------------------------------------------

def test_tws_full_protocol_e2e(spark, tmp_path):
    """One TWS query exercising the whole protocol surface the mini
    runtime must encode/decode: value state (with TTL), list state
    (appendValue + get iteration), map state (updateValue / getValue /
    containsKey / iterator / keys), timer registration, and
    timer-expiry emission (`handleExpiredTimer`, dead code until this
    runtime existed)."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from farmrpg_etl_spark.streaming.chat_cdc import tws_available
    from farmrpg_etl_spark.streaming.ops import run_available_now

    assert tws_available(), "mini runtime should make TWS available"

    class StatsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._count = handle.getValueState("cnt", "n bigint", 3_600_000)
            self._vals = handle.getListState("vals", "v bigint")
            self._by_type = handle.getMapState("bytype", "t string", "c bigint")

        def handleInputRows(self, key, rows, timerValues):
            total = 0
            by: dict[str, int] = {}
            for pdf in rows:
                for t, v in zip(pdf["etype"], pdf["value"]):
                    total += 1
                    by[t] = by.get(t, 0) + int(v)
                    self._vals.appendValue((int(v),))
            prev = self._count.get()[0] if self._count.exists() else 0
            self._count.update((prev + total,))
            for t, add in by.items():
                cur = (
                    self._by_type.getValue((t,))[0]
                    if self._by_type.containsKey((t,))
                    else 0
                )
                self._by_type.updateValue((t,), (cur + add,))
            self._handle.registerTimer(1)  # long past: expires this batch
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            vals = [r[0] for r in self._vals.get()]
            pairs = {k[0]: v[0] for k, v in self._by_type.iterator()}
            n_keys = sum(1 for _ in self._by_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n": [self._count.get()[0]],
                    "list_sum": [sum(vals)],
                    "map_sum": [sum(pairs.values())],
                    "n_types": [n_keys],
                    "expired_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self) -> None:
            pass

    rows = [
        ("alice", "click", 1), ("alice", "click", 10), ("alice", "buy", 100),
        ("bob", "view", 7),
    ]
    src = str(tmp_path / "tws_proto_src")
    spark.createDataFrame(
        rows, "user_id string, etype string, value long"
    ).coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema("user_id string, etype string, value long") \
        .parquet(src)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    out_schema = (
        "user_id string, n bigint, list_sum bigint, map_sum bigint, "
        "n_types bigint, expired_ms bigint"
    )
    out = run_available_now(
        sdf.groupBy("user_id").transformWithStateInPandas(
            StatsProcessor(), out_schema, "append", "ProcessingTime"
        ),
        "append",
    )
    got = {r["user_id"]: r.asDict() for r in out.collect()}
    assert got["alice"]["n"] == 3
    assert got["alice"]["list_sum"] == 111
    assert got["alice"]["map_sum"] == 111
    assert got["alice"]["n_types"] == 2
    assert got["alice"]["expired_ms"] == 1
    assert got["bob"]["n"] == 1 and got["bob"]["map_sum"] == 7


def test_truncated_length_delimited_raises():
    m = sm.StateResponse()
    # field 3 (bytes) declares 5 bytes but only 2 follow
    with pytest.raises(ValueError, match="truncated"):
        m.ParseFromString(b"\x1a\x05ab")


def test_read_vivified_oneof_sibling_never_serializes():
    """Reading a oneof member vivifies it locally, but serialization
    emits only the LAST-SET member — a mere read can't put two oneof
    fields on the wire."""
    req = sm.StateRequest()
    _ = req.statefulProcessorCall  # read-vivify
    req.timerRequest = sm.TimerRequest(
        expiryTimerRequest=sm.ExpiryTimerRequest(iteratorId="i")
    )
    _ = req.stateVariableRequest  # read-vivify AFTER the assignment
    wire = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(wire)
    assert back.HasField("timerRequest")
    assert not back.HasField("statefulProcessorCall")
    assert not back.HasField("stateVariableRequest")
