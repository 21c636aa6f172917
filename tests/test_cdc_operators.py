"""CDC / dedup / latest-per-key semantics (SURVEY §2.4/§2.6).

Pins the reference's transition behavior: deleted False→True stamps
``deleted_ts`` with the observation time and carries it forward
(scrapers/chat.py:158-171), no-op snapshots are skipped ignoring
volatile fields (db/user.py:12-40), latest-per-key is top-1 by ts
with deterministic tiebreak (db/user.py:17, test/models/test_user.py:38-40).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from farmrpg_etl_spark.operators import cdc, dedup, latest


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_changes_emits_first_and_changed(spark):
    rows = [
        ("k1", ts("2024-01-01 00:00:00"), "a"),
        ("k1", ts("2024-01-01 00:01:00"), "a"),   # unchanged → dropped
        ("k1", ts("2024-01-01 00:02:00"), "b"),   # changed → emitted
        ("k2", ts("2024-01-01 00:00:30"), "x"),   # first → emitted
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, v string")
    got = sorted(
        (r["id"], r["ts"]) for r in cdc.changes(df, ["id"], "ts", ["v"]).collect()
    )
    assert got == [
        ("k1", ts("2024-01-01 00:00:00")),
        ("k1", ts("2024-01-01 00:02:00")),
        ("k2", ts("2024-01-01 00:00:30")),
    ]


def test_changes_null_safe(spark):
    rows = [
        ("k", ts("2024-01-01 00:00:00"), None),
        ("k", ts("2024-01-01 00:01:00"), None),   # null == null → no change
        ("k", ts("2024-01-01 00:02:00"), "a"),    # null → a: change
        ("k", ts("2024-01-01 00:03:00"), None),   # a → null: change
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, v string")
    got = sorted(r["ts"] for r in cdc.changes(df, ["id"], "ts", ["v"]).collect())
    assert got == [ts("2024-01-01 00:00:00"), ts("2024-01-01 00:02:00"),
                   ts("2024-01-01 00:03:00")]


def test_deleted_transition_stamps_and_carries_forward(spark):
    rows = [
        ("m1", ts("2024-01-01 00:00:00"), False),
        ("m1", ts("2024-01-01 00:01:00"), True),   # flip → stamp 00:01
        ("m1", ts("2024-01-01 00:02:00"), True),   # carried forward
        # first obs already deleted: no transition witnessed → NO stamp
        # (reference requires prior state, chat.py:163-168)
        ("m2", ts("2024-01-01 00:00:00"), True),
        ("m3", ts("2024-01-01 00:00:00"), False),  # never deleted → null
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, deleted boolean")
    got = {
        (r["id"], r["ts"]): r["deleted_ts"]
        for r in cdc.deleted_transitions(df, ["id"], "ts").collect()
    }
    assert got[("m1", ts("2024-01-01 00:00:00"))] is None
    assert got[("m1", ts("2024-01-01 00:01:00"))] == ts("2024-01-01 00:01:00")
    assert got[("m1", ts("2024-01-01 00:02:00"))] == ts("2024-01-01 00:01:00")
    assert got[("m2", ts("2024-01-01 00:00:00"))] is None
    assert got[("m3", ts("2024-01-01 00:00:00"))] is None


def test_deleted_restamps_after_undelete(spark):
    # reference carries deleted_ts unconditionally once stamped
    # (scrapers/chat.py:160-162) and a re-delete flip re-stamps
    rows = [
        ("m", ts("2024-01-01 00:00:00"), False),
        ("m", ts("2024-01-01 00:01:00"), True),   # flip → stamp
        ("m", ts("2024-01-01 00:02:00"), False),  # undeleted → stamp carried
        ("m", ts("2024-01-01 00:03:00"), True),   # re-flip → new stamp
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, deleted boolean")
    got = {
        r["ts"]: r["deleted_ts"]
        for r in cdc.deleted_transitions(df, ["id"], "ts").collect()
    }
    assert got[ts("2024-01-01 00:00:00")] is None
    assert got[ts("2024-01-01 00:01:00")] == ts("2024-01-01 00:01:00")
    assert got[ts("2024-01-01 00:02:00")] == ts("2024-01-01 00:01:00")
    assert got[ts("2024-01-01 00:03:00")] == ts("2024-01-01 00:03:00")


def test_noop_eliminate_ignores_volatile(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), "alice", True),
        (1, ts("2024-01-01 01:00:00"), "alice", True),   # no-op → dropped
        (1, ts("2024-01-01 02:00:00"), "alice", False),  # role flip → kept
        (2, ts("2024-01-01 00:30:00"), "bob", False),    # first → kept
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, username string, is_ranger boolean"
    )
    got = sorted(
        (r["user_id"], r["ts"])
        for r in cdc.noop_eliminate(df, ["user_id"], "ts").collect()
    )
    assert got == [
        (1, ts("2024-01-01 00:00:00")),
        (1, ts("2024-01-01 02:00:00")),
        (2, ts("2024-01-01 00:30:00")),
    ]


def test_change_pairs_exposes_prev(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), "farmhand"),
        (1, ts("2024-01-01 01:00:00"), "ranger"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, role string")
    got = {
        r["ts"]: (r["role"], r["prev_role"])
        for r in cdc.change_pairs(df, ["user_id"], "ts", ["role"]).collect()
    }
    assert got[ts("2024-01-01 00:00:00")] == ("farmhand", None)
    assert got[ts("2024-01-01 01:00:00")] == ("ranger", "farmhand")


def test_latest_per_key_strategies_agree_on_ties(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), 10, "a"),
        (1, ts("2024-01-01 00:00:00"), 11, "b"),  # ts tie → higher tiebreak wins
        (1, ts("2023-12-31 00:00:00"), 99, "c"),
        (2, ts("2024-01-01 00:00:00"), 5, "d"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, v string")
    w = latest.latest_per_key(df, ["k"], "ts", tiebreak=["tb"])
    a = latest.latest_per_key_agg(df, ["k"], "ts", tiebreak=["tb"])
    want = {(1, "b"), (2, "d")}
    assert {(r["k"], r["v"]) for r in w.collect()} == want
    assert {(r["k"], r["v"]) for r in a.collect()} == want


def test_keep_first_per_key_deterministic(spark):
    rows = [
        (7, ts("2024-01-01 00:00:00"), 2),
        (7, ts("2024-01-01 00:00:00"), 1),  # same ts → lower id wins
        (7, ts("2024-01-02 00:00:00"), 0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long")
    got = dedup.keep_first_per_key(df, ["k"], "ts", ["id"]).collect()
    assert len(got) == 1 and got[0]["id"] == 1


def test_exact_dedup_whitespace_case_insensitive(spark):
    rows = [
        (1, "Hello  World"),
        (2, "hello world"),      # same after normalization → dropped (min id kept)
        (3, "different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in dedup.exact_dedup(df, "text", "doc_id").collect())
    assert got == [1, 3]
