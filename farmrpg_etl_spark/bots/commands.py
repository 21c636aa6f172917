"""Bot command parsing/dispatch and side-effect sinks (K6/K7).

Reference: mail text's first ``<br>``-split line is a command word plus
args (bots/base.py:36-61); handlers are ``ping`` (bots/ping.py:5-12)
and ``register <28-char-uid>`` / ``userinfo`` (bots/firebase.py:8-31);
replies POST back with subject fallback ``RE: ...`` (bots/base.py:23-33);
the Firebase claims sink fires only when claims changed
(firestore/user.py:6-13, D5).

Spark form: command parsing is pure column expressions; dispatch is a
``when`` chain producing reply rows; the actual send is a
``foreachBatch`` side-effect behind a pluggable callable (stubbed here
— no network), guarded for replay idempotency.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions import text as T

KNOWN_COMMANDS = ["ping", "userinfo", "register"]


def parse_commands(mail: DataFrame) -> DataFrame:
    """Mail rows (id, username, ts, subject, content) → command rows
    (cmd, args, + originals). Unknown commands yield cmd='unknown'."""
    first = T.first_line(F.col("content"))
    cmd = T.command_word(first)
    args = F.ltrim(
        F.expr("substring(lf, length(cw) + 1, length(lf))")
    )
    out = (
        mail.withColumn("lf", F.trim(first))
        .withColumn("cw", cmd)
        .withColumn("args", args)
        .withColumn(
            "cmd",
            F.when(F.col("cw").isin(KNOWN_COMMANDS), F.col("cw")).otherwise(
                F.lit("unknown")
            ),
        )
        .drop("lf", "cw")
    )
    return out


def dispatch_commands(commands: DataFrame, users: DataFrame | None = None) -> DataFrame:
    """Produce reply rows (reply_to_id, username, subject, body).

    * ping → "pong" (bots/ping.py:5-12)
    * register → F5 28-char UID validation; ok/error body
      (bots/firebase.py:8-21)
    * userinfo → latest registered uid for the sender, joined from
      ``users`` (id, firebase_uid) when provided (bots/firebase.py:23-31)
    * unknown → usage hint
    """
    c = commands
    if users is not None:
        c = c.join(
            F.broadcast(users.select(F.col("firebase_uid"), F.col("username").alias("__u"))),
            c["username"] == F.col("__u"),
            "left",
        ).drop("__u")
    else:
        c = c.withColumn("firebase_uid", F.lit(None).cast("string"))
    uid_ok = F.length(F.trim(F.col("args"))) == 28  # F5 validation
    body = (
        F.when(F.col("cmd") == "ping", F.lit("pong"))
        .when(
            (F.col("cmd") == "register") & uid_ok,
            F.concat(F.lit("registered "), F.trim(F.col("args"))),
        )
        .when(
            F.col("cmd") == "register",
            F.lit("error: firebase uid must be exactly 28 characters"),
        )
        .when(
            F.col("cmd") == "userinfo",
            F.coalesce(
                F.concat(F.lit("uid: "), F.col("firebase_uid")),
                F.lit("not registered"),
            ),
        )
        .otherwise(F.lit("unknown command; try ping, userinfo, register <uid>"))
    )
    subject = F.when(
        F.trim(F.col("subject")) != "", F.concat(F.lit("RE: "), F.col("subject"))
    ).otherwise(F.lit("RE: (no subject)"))
    return commands.select("id", "username", "subject").join(
        c.select("id", body.alias("body")), "id"
    ).select(
        F.col("id").alias("reply_to_id"),
        "username",
        subject.alias("subject"),
        "body",
    )


def reply_sink(
    replies: DataFrame,
    send: Callable[[int, str, str, str], None],
    sent_log: set[int] | None = None,
) -> int:
    """K7 — side-effect reply sink.

    ``send(reply_to_id, username, subject, body)`` is the network call
    (reference POSTs worker.php?go=sendmessage, bots/base.py:23-33) —
    stub or real client. ``sent_log`` provides replay idempotency (the
    reference's dedup comes from mail-id FIFO caching upstream, D2).

    The reply set is small (bounded by inbound DMs), so collecting to
    the driver for the side-effect loop is the correct pattern — the
    data path never collects.
    """
    n = 0
    for r in replies.collect():
        if sent_log is not None and r["reply_to_id"] in sent_log:
            continue
        send(r["reply_to_id"], r["username"], r["subject"], r["body"])
        if sent_log is not None:
            sent_log.add(r["reply_to_id"])
        n += 1
    return n


def make_http_reply_sender(fetcher) -> Callable[[int, str, str, str], None]:
    """Real network ``send`` for :func:`reply_sink` — POSTs the
    reference's exact reply shape (bots/base.py:23-33):
    ``POST worker.php?go=sendmessage`` with the form body
    ``in_reply_to/to/subject/body``, through the authenticated
    :class:`~farmrpg_etl_spark.sources.http.HttpFetcher`. A non-200
    raises so the caller's idempotency log never records a failed
    send (at-least-once, the reference's fire-and-forget upgraded)."""

    def send(reply_to_id: int, username: str, subject: str, body: str) -> None:
        status, resp = fetcher.post(
            "worker.php",
            {"go": "sendmessage"},
            data={
                "in_reply_to": str(reply_to_id),
                "to": username,
                "subject": subject,
                "body": body,
            },
        )
        if status != 200 or resp == b"no access":
            raise RuntimeError(
                f"sendmessage failed: status={status} body={resp[:200]!r}"
            )

    return send


def push_claims(
    changes: DataFrame,
    fetcher,
    bearer: str,
    sent_log: set[tuple] | None = None,
    uid_col: str = "firebase_uid",
    order_col: str | None = None,
) -> int:
    """K6 over real HTTP — one ``POST v1/accounts:update`` per
    claims-CHANGE row (reference firebase.py:27-36: JSON body
    ``{"localId": uid, "customAttributes": json.dumps(claims)}``,
    Bearer auth). Input is the D5-gated change set
    (:func:`claims_changes`), which is small by construction — the
    gate, not this loop, is the scale story; the data path never
    collects.

    ``accounts:update`` is a STATE-SETTING API, so two properties
    matter beyond delivery (r11 advice #2):

    * **replay key** — with ``order_col`` (the change event id) the
      replay log keys on ``(uid, change_id)``, so a legitimate
      re-transition A→B→A posts the second A instead of being
      swallowed by a payload-keyed log (at-least-once per CHANGE, as
      documented). Without ``order_col`` the legacy payload key
      applies (correct only when the caller pre-reduces to one change
      per uid).
    * **per-uid ordering** — rows are sorted by ``(uid, order_col)``
      before posting, so the receiver's final ``customAttributes`` is
      the LATEST state, deterministically, even with several changes
      per uid in one push.
    """
    cols = [F.col(uid_col).alias("__uid"), "claims"]
    if order_col is not None:
        cols.append(F.col(order_col).alias("__ord"))
    rows = changes.select(*cols).collect()
    if order_col is not None:
        # null-last sentinel sort (r12 advice): a null order value must
        # not TypeError the whole push — nulls post after ordered rows
        rows.sort(
            key=lambda r: (
                str(r["__uid"]),
                r["__ord"] is None,
                0 if r["__ord"] is None else r["__ord"],
            )
        )
    n = 0
    for r in rows:
        uid = r["__uid"]
        key = (
            (uid, r["__ord"]) if order_col is not None else (uid, r["claims"])
        )
        if uid is None or (sent_log is not None and key in sent_log):
            continue
        status, resp = fetcher.post(
            "v1/accounts:update",
            json_body={"localId": str(uid), "customAttributes": r["claims"]},
            bearer=bearer,
        )
        if status != 200:
            raise RuntimeError(
                f"accounts:update failed: status={status} body={resp[:200]!r}"
            )
        if sent_log is not None:
            sent_log.add(key)
        n += 1
    return n


def push_claims_distributed(
    changes: DataFrame,
    fetcher,
    bearer: str,
    uid_col: str = "firebase_uid",
    parallelism: int | None = None,
    order_col: str | None = None,
    send_change_id: bool = False,
) -> None:
    """K6 send path for LARGE change sets: ``foreachPartition`` posts
    each partition's claims from the EXECUTORS (the picklable
    ``HttpFetcher`` ships like the S4/S7 fan-out fetchers), so
    throughput scales with partitions instead of serializing through
    the driver — measured 82 s for 64k driver-side posts at sf0.1 vs
    seconds distributed. A non-200 raises and fails the task loudly.
    Delivery is at-least-once under Spark task retry (same contract
    as the reference's fire-and-forget tasks); the receiving API is
    idempotent per (localId, customAttributes) payload, which is what
    makes retry safe. Use :func:`push_claims` when a replay log and
    strict once-per-payload sends matter more than throughput.

    The explicit ``repartition`` matters: the change set is usually
    the tail of a windowed plan that AQE coalesces into ONE tiny
    partition (small in BYTES), which would serialize the sends — the
    r11 profile measured 75 s for 64k posts on the coalesced plan.
    Network calls cost per ROW, not per byte; byte-based coalescing
    is the wrong heuristic for side-effecting partitions.

    Ordering (r11 advice #2): with ``order_col`` (the change event
    id) the payloads hash-partition on uid and sort within partitions
    by ``(uid, order_col)``, so every uid's changes are posted by ONE
    task, in change order — the receiver's final state is
    deterministically the latest change. Without ``order_col`` the
    legacy round-robin repartition applies (maximum balance; only
    safe when at most one change per uid survives the gate).

    ``send_change_id`` (r12 advice #3 — OFF by default): when True
    AND ``order_col`` is set, the change id also travels as a
    ``changeId`` query param so a RECORDING receiver (e.g. the test
    site, or a proxy that logs sends) can dedupe task-retry /
    connection-retry replays on ``(localId, claims, changeId)``. The
    real Google identitytoolkit ``accounts:update`` endpoint defines
    no such param — leave this False against it and rely on per-uid
    ordering plus payload idempotency; the API offers no nonce. Rows
    whose order value is null carry no nonce (never the literal
    string ``"None"``)."""
    if parallelism is None:
        parallelism = changes.sparkSession.sparkContext.defaultParallelism
    has_nonce = order_col is not None
    if has_nonce:
        payloads = (
            changes.select(
                F.col(uid_col).cast("string").alias("__uid"),
                "claims",
                F.col(order_col).alias("__ord"),
                F.col(order_col).cast("string").alias("__change_id"),
            )
            .filter(F.col("__uid").isNotNull())
            .repartition(parallelism, "__uid")
            .sortWithinPartitions("__uid", "__ord")
        )
    else:
        payloads = (
            changes.select(
                F.col(uid_col).cast("string").alias("__uid"), "claims"
            )
            .filter(F.col("__uid").isNotNull())
            .repartition(parallelism)
        )

    with_nonce = send_change_id and has_nonce

    def send_partition(rows) -> None:
        for r in rows:
            params = None
            if with_nonce and r["__change_id"] is not None:
                params = {"changeId": r["__change_id"]}
            status, resp = fetcher.post(
                "v1/accounts:update",
                params=params,
                json_body={
                    "localId": r["__uid"],
                    "customAttributes": r["claims"],
                },
                bearer=bearer,
            )
            if status != 200:
                raise RuntimeError(
                    f"accounts:update failed: status={status} "
                    f"body={resp[:200]!r}"
                )

    payloads.foreachPartition(send_partition)


def claims_changes(change_pairs: DataFrame) -> DataFrame:
    """K6 gate — emit claims payloads only when the claims projection
    changed between consecutive snapshots (D5 → firestore/user.py:7-13).

    Input: change-pair rows with is_farmhand/is_ranger and their
    ``prev_`` columns (operators.cdc.change_pairs output).
    """
    claims = F.to_json(
        F.struct(
            F.col("is_farmhand").cast("string").alias("farmhand"),
            F.col("is_ranger").cast("string").alias("ranger"),
        )
    )
    prev_claims = F.to_json(
        F.struct(
            F.col("prev_is_farmhand").cast("string").alias("farmhand"),
            F.col("prev_is_ranger").cast("string").alias("ranger"),
        )
    )
    return (
        change_pairs.withColumn("claims", claims)
        .withColumn("__prev", prev_claims)
        .filter(
            F.col("prev_is_farmhand").isNull() | (F.col("claims") != F.col("__prev"))
        )
        .drop("__prev")
    )
