"""J1 — flags↔message resolution as a watermarked stream-stream join.

Reference (firestore/chat.py:22-24,59-78): flag-log rows carry no
message id; an in-memory FIFO map keyed ``room → {ts|username → id}``
(110 entries/room), populated by the chat stream, resolves them;
unresolved rows are logged and dropped.

Spark form: equi-join of the two streams on (room, ts, username) with
watermarks on both sides. The FIFO cache's capacity bound becomes the
watermark delay — state for chat rows older than the delay is evicted
exactly like cache eviction — and the reference's 30 s "settle"
ordering (__main__.py:64-65) disappears: the join holds flags rows
until a matching chat row arrives or the watermark passes.

Scale: both sides shuffle once on (room, ts, username) — high
cardinality, uniform; state is bounded by the watermark on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flags_resolution_join(
    chat: DataFrame,
    flags: DataFrame,
    watermark_delay: str = "10 minutes",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Join a flags stream (room, ts, username, flags) to a chat stream
    (room, id, ts, username) → (room, id, ts, username, flags).

    Inner join by default: unresolved flags rows are dropped once the
    watermark passes (the reference drops-with-log,
    firestore/chat.py:72-78). With ``keep_unmatched=True`` the join is
    flags-side LEFT OUTER, so the dropped rows become OBSERVABLE —
    they emit with ``id IS NULL`` when the watermark passes (stream)
    or immediately (batch), giving the reference's log line a real
    quarantine/alerting channel instead of silence. Works identically
    for batch DataFrames (watermarks become no-ops).
    """
    c = (
        chat.select("room", "id", "ts", "username")
        .withWatermark("ts", watermark_delay)
        .alias("c")
    )
    f = (
        flags.select("room", "ts", "username", "flags")
        .withWatermark("ts", watermark_delay)
        .alias("f")
    )
    cond = (
        (F.col("c.room") == F.col("f.room"))
        & (F.col("c.ts") == F.col("f.ts"))
        & (F.col("c.username") == F.col("f.username"))
    )
    if keep_unmatched:
        joined = f.join(c, cond, "left_outer")
        return joined.select(
            F.col("f.room").alias("room"),
            F.col("c.id").alias("id"),
            F.col("f.ts").alias("ts"),
            F.col("f.username").alias("username"),
            F.col("f.flags").alias("flags"),
        )
    joined = c.join(f, cond, "inner")
    return joined.select(
        F.col("c.room").alias("room"),
        F.col("c.id").alias("id"),
        F.col("c.ts").alias("ts"),
        F.col("c.username").alias("username"),
        F.col("f.flags").alias("flags"),
    )
