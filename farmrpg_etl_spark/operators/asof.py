"""As-of and range (band) joins — temporal operators Spark lacks natively.

Both are expressed as compositions of built-in DataFrame ops (union +
running window, bucketed equi-join + band filter), so Catalyst plans
them with ordinary shuffles — no cartesian products, no UDFs.

Scale notes
-----------
``asof_join`` costs exactly one shuffle + one sort on the join key —
the same physical work as a sort-merge join of the two sides — and the
window state is O(1) per row (a running ``last``), never a buffered
range. That beats the naive formulation (inequality join + row_number)
whose join step emits |left| × |matching right| intermediate rows.

``range_join`` buckets the time axis so each right row lands in exactly
one bucket and each left row probes the ≤ ``ceil(span/bucket)+1``
buckets its band can overlap: candidate blowup is bounded by the
band/bucket ratio (2× at the default bucket=span), not by key
cardinality. Skewed keys behave like any equi-join under AQE skew
handling; never use a low-cardinality column alone as ``on``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance_sec: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Join each ``left`` row to the single best-matching ``right`` row
    by time: the latest ``right_ts <= left_ts`` (``backward``, default)
    or the earliest ``right_ts >= left_ts`` (``forward``), per key.

    ``right``'s non-key, non-ts columns are carried through and must
    not collide with ``left``'s names (project/alias before calling).
    Ties on ``right_ts`` are broken by the largest (backward) /
    smallest (forward) ``tiebreak`` value, making the winner
    deterministic. ``tolerance_sec`` voids matches further than that
    many seconds from ``left_ts``. ``how`` is ``left`` (keep unmatched
    left rows with NULLs) or ``inner``.

    Physical plan: tag both sides, union, one window per key ordered by
    (ts, side, tiebreak) taking the running ``last`` non-null right
    payload, keep the left rows. One shuffle, one sort, O(1) state.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names (alias one)")
    payload = [c for c in right.columns if c not in set(keys) | {right_ts}]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    left_payload = [c for c in left.columns if c not in set(keys) | {left_ts}]

    match_t = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload]
    )
    tb = (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long")
    build = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        match_t.alias("__match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    probe = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(build.schema["__match"].dataType).alias("__match"),
        *left_payload,
    )
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = build.unionByName(probe).withColumn(
        "__hit", F.last("__match", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__hit.__rts"))
        )
        out = out.withColumn(
            "__hit",
            F.when(gap <= F.lit(int(tolerance_sec * 1_000_000)), F.col("__hit")),
        )
    if how == "inner":
        out = out.filter(F.col("__hit").isNotNull())
    return out.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_payload,
        F.col("__hit.__rts").alias(right_ts),
        *[F.col(f"__hit.{c}").alias(c) for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
    *,
    bucket_sec: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with the same key where ``right_ts`` is
    inside the half-open band ``[left_ts + lower_sec, left_ts +
    upper_sec)``. Returns left columns + right's non-key columns
    (which must not collide; alias beforehand).

    Physical plan: floor right rows into time buckets of ``bucket_sec``
    (default: the band width), explode each left row to the buckets its
    band overlaps via ``sequence``, equi-join on (key, bucket), then
    apply the exact band filter. Each right row is in exactly one
    bucket, so pairs are produced at most once — no dedup pass.
    """
    if upper_sec <= lower_sec:
        raise ValueError("upper_sec must be > lower_sec")
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(right.columns) - set(keys)) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    span_us = int((upper_sec - lower_sec) * 1_000_000)
    bucket_us = int(bucket_sec * 1_000_000) if bucket_sec else max(span_us, 1)
    lo_us = int(lower_sec * 1_000_000)
    hi_us = int(upper_sec * 1_000_000)

    lm = F.unix_micros(F.col(left_ts))
    rm = F.unix_micros(F.col(right_ts))
    r = right.withColumn("__bkt", F.floor(rm / F.lit(bucket_us)))
    l = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor((lm + F.lit(lo_us)) / F.lit(bucket_us)),
                F.floor((lm + F.lit(hi_us)) / F.lit(bucket_us)),
            )
        ),
    )
    joined = l.join(r, on=[*keys, "__bkt"]).filter(
        (rm >= lm + F.lit(lo_us)) & (rm < lm + F.lit(hi_us))
    )
    return joined.drop("__bkt")
