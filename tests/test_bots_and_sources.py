"""Bot command dispatch (K6/K7) and source landing-zone plumbing tests."""

from __future__ import annotations

from datetime import datetime

from farmrpg_etl_spark.bots.commands import (
    claims_changes,
    dispatch_commands,
    parse_commands,
    reply_sink,
)
from farmrpg_etl_spark.operators import cdc
from farmrpg_etl_spark.sources.landing import (
    PAYLOAD_SCHEMA,
    PollSpec,
    demand_fanout,
    land_poll_sweep,
    read_landing,
)

MAIL_SCHEMA = "id long, username string, ts timestamp, subject string, content string"
T0 = datetime(2024, 1, 1)


def test_parse_and_dispatch_commands(spark):
    mail = spark.createDataFrame(
        [
            (1, "alice", T0, "hi", "ping"),
            (2, "bob", T0, "reg", "REGISTER " + "u" * 28 + "<br>ignored tail"),
            (3, "caro", T0, "reg", "register short"),
            (4, "dave", T0, "", "what is this"),
            (5, "erin", T0, "q", "userinfo"),
        ],
        MAIL_SCHEMA,
    )
    users = spark.createDataFrame(
        [("erin", "e" * 28)], "username string, firebase_uid string"
    )
    cmds = parse_commands(mail)
    got = {r["id"]: (r["cmd"], r["args"]) for r in cmds.collect()}
    assert got[1] == ("ping", "")
    assert got[2] == ("register", "u" * 28)
    assert got[3] == ("register", "short")
    assert got[4] == ("unknown", "is this")
    replies = {r["reply_to_id"]: r for r in dispatch_commands(cmds, users).collect()}
    assert replies[1]["body"] == "pong"
    assert replies[1]["subject"] == "RE: hi"
    assert replies[2]["body"] == "registered " + "u" * 28
    assert "28 characters" in replies[3]["body"]
    assert replies[4]["subject"] == "RE: (no subject)"
    assert replies[5]["body"] == "uid: " + "e" * 28


def test_reply_sink_idempotent(spark):
    replies = spark.createDataFrame(
        [(1, "alice", "RE: hi", "pong")],
        "reply_to_id long, username string, subject string, body string",
    )
    sent: list[int] = []
    log: set[int] = set()
    assert reply_sink(replies, lambda i, u, s, b: sent.append(i), log) == 1
    assert reply_sink(replies, lambda i, u, s, b: sent.append(i), log) == 0
    assert sent == [1]


def test_claims_gate_only_on_change(spark):
    snaps = spark.createDataFrame(
        [
            (1, T0, False, False),
            (1, datetime(2024, 1, 2), False, True),   # role change → claims change
            (2, T0, True, False),
            (2, datetime(2024, 1, 2), True, False),   # no change → suppressed by D5
        ],
        "user_id long, ts timestamp, is_farmhand boolean, is_ranger boolean",
    )
    pairs = cdc.change_pairs(
        snaps, ["user_id"], "ts", ["is_farmhand", "is_ranger"]
    )
    out = claims_changes(pairs)
    got = sorted((r["user_id"], r["ts"]) for r in out.collect())
    assert got == [(1, T0), (1, datetime(2024, 1, 2)), (2, T0)]


def test_landing_zone_roundtrip(spark, tmp_path):
    landing = str(tmp_path / "landing")
    n = land_poll_sweep(
        spark,
        landing,
        fetcher=lambda spec: (200, f"<html>{spec.source}:{spec.key}</html>".encode()),
        fetch_ts=datetime(2024, 1, 1, 12, 0, 0),
    )
    assert n == 17  # 7 chat + 7 flags + mailbox + online + staff
    df = read_landing(spark, landing)
    assert df.count() == 17
    chat = df.filter("source = 'chat'")
    assert chat.count() == 7
    row = chat.filter("key = 'help'").first()
    assert bytes(row["body"]) == b"<html>chat:help</html>"
    assert row["fetch_ts"] == datetime(2024, 1, 1, 12, 0, 0)


def test_demand_fanout_shape(spark):
    keys = spark.createDataFrame([("alice",), ("bob",)], "key string")
    out = demand_fanout(
        keys, "profile",
        fetcher=lambda spec: (200, f"profile:{spec.key}".encode()),
    )
    rows = {r["key"]: bytes(r["body"]) for r in out.collect()}
    assert rows == {"alice": b"profile:alice", "bob": b"profile:bob"}
    assert out.schema.simpleString().startswith(
        "struct<source:string,key:string,fetch_ts:timestamp"
    )


def test_poll_datasource_streams_schedule(spark, tmp_path):
    """The PySpark 4 Python streaming source: REFERENCE_POLLS expanded
    by offset ticks, deterministic bodies, chat payloads parseable by
    the real P1 parser."""
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.sources.pollsource import PollDataSource

    spark.dataSource.register(PollDataSource)
    out = []
    q = (
        spark.readStream.format("farmrpg_poll")
        .option("advance_per_batch", "40")
        .option("max_ticks", "80")
        .load()
        .writeStream.foreachBatch(lambda df, bid: out.append(df.collect()))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [r for b in out for r in b]
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    # 80 ticks: chat = 80/room x 7 rooms, flags = 2/room (30, 60),
    # mailbox = 8, online/staff not yet due
    assert len(by_source["chat"]) == 80 * 7
    assert len(by_source["flags"]) == 2 * 7
    assert len(by_source["mailbox"]) == 8
    assert "online" not in by_source
    # fetch_ts is schedule-derived, never executor wall clock
    ts = sorted(r.fetch_ts for r in by_source["mailbox"])
    assert (ts[1] - ts[0]).total_seconds() == 10
    # chat bodies run through the REAL parse stage
    from farmrpg_etl_spark.parse.stage import parse_payloads, parsed_rows

    chat_df = spark.createDataFrame(
        [r for r in rows if r.source == "chat" and r.key == "help"]
    )
    parsed = parsed_rows(parse_payloads(chat_df, "chat"))
    assert parsed.count() == 80
    assert parsed.filter(F.col("username").startswith("u")).count() == 80


def test_poll_datasource_replay_is_deterministic(spark):
    """read() of the same offset range yields byte-identical rows —
    the exactly-once replay contract."""
    from farmrpg_etl_spark.sources.pollsource import PollStreamReader

    r1 = PollStreamReader({"max_ticks": "60", "sources": "chat,flags"})
    r2 = PollStreamReader({"max_ticks": "60", "sources": "chat,flags"})
    end1, end2 = r1.latestOffset(), r2.latestOffset()
    assert end1 == end2
    p1 = r1.partitions({"tick": 0}, end1)
    p2 = r2.partitions({"tick": 0}, end2)
    rows1 = [row for p in p1 for row in r1.read(p)]
    rows2 = [row for p in p2 for row in r2.read(p)]
    assert rows1 == rows2 and len(rows1) > 0
