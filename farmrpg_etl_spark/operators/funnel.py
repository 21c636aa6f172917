"""Funnel and cohort-retention analytics over event streams.

The two workhorse product-analytics queries (Amplitude/Mixpanel-class
engines run them at web scale): ordered-step funnel conversion and
cohort retention matrices. Both are expressed as compositions of
aggregations and equi-joins on the user key — never a per-user sort
of the raw event log.

Scale shape (100 TB event log):
* every aggregation is keyed on ``user_id`` — uniform, partial-agg
  absorbed map-side; no window over the raw events, no
  ``collect_list`` of a user's history;
* each funnel step joins the (one row per user) frontier from the
  previous step back to the filtered event scan — the frontier is
  users-sized, not events-sized, and the step filter is pushed to the
  parquet scan (``event_type = 'x'`` prunes row groups);
* the retention matrix reduces to DISTINCT (cohort, offset, user)
  before the final count — two shuffles total, both on keys whose
  cardinality collapses fast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: int = 24,
) -> DataFrame:
    """Ordered-step funnel: a user completes step *k* if an event of
    ``steps[k]`` occurs STRICTLY after their step *k-1* completion
    and within ``within_hours`` of it; each completion time is the
    EARLIEST qualifying event (the standard first-touch funnel
    semantics, deterministic because min is order-free).

    Returns one row per user who entered the funnel: ``(user, t1..tN,
    steps_completed)`` with NULL times for uncompleted steps.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev_t = f"t{k - 1}"
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(frontier.select(user_col, prev_t), user_col)
            .filter(
                (F.col("__ts") > F.col(prev_t))
                & (
                    F.col("__ts")
                    <= F.col(prev_t)
                    + F.expr(f"INTERVAL {int(within_hours)} HOURS")
                )
            )
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        frontier = frontier.join(nxt, user_col, "left")
    done = sum(
        F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
        for k in range(1, len(steps) + 1)
    )
    return frontier.withColumn("steps_completed", done.cast("int"))


def funnel_summary(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Collapse a :func:`funnel` frame to the conversion counts:
    ``(step, n_users)`` where ``n_users`` = users completing at least
    that step. One tiny aggregation over the users-sized frame."""
    counts = funnel_df.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col("steps_completed") >= k, 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias(f"s{k}")
            # coalesce: an EMPTY funnel (nobody entered) must report
            # zeros, not NULL sums (hypothesis-found edge)
            for k in range(1, n_steps + 1)
        ]
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("step"), F.col(f"s{k}").alias("n_users")
                )
                for k in range(1, n_steps + 1)
            ]
        )
    )
    return counts.select(pairs.alias("p")).select("p.step", "p.n_users")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention matrix: cohort = the user's first-event
    day, offset = days since cohort day, value = distinct users from
    that cohort active at that offset. ``offset 0`` row equals cohort
    size, so the matrix carries its own denominator."""
    first = events.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    act = (
        events.select(user_col, F.to_date(ts_col).alias("day"))
        .distinct()
        .join(first, user_col)
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
            F.col(user_col),
        )
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(from_type, to_type, n, p)`` with ``p`` normalized
    per source state. The sequence order is (ts, tiebreak) so ties
    are deterministic.

    Shapes: ONE per-user window (uniform key, bounded per-user
    history — the sessionize shape) for the lead, then two
    partial-agg shuffles over the tiny type×type key space. ``p`` is
    an exact integer-count ratio, bit-identical cross-engine."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    seq = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("from_type").agg(F.sum("n").alias("__tn"))
    return t.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("__tn").cast("double"), 6)
        .alias("p"),
    )


def linear_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_type: str = "click",
    window_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch LINEAR attribution: every conversion splits one
    unit of credit equally over the user's touch events in the
    preceding ``window_hours`` (strictly before the conversion,
    inclusive window start is open: ``conv_ts - W < touch_ts <
    conv_ts``). Complements the last-touch model of the as-of join
    row. Per-pair credit is floor-quantized to micros and summed as
    exact integers, so a touch credited by many conversions gets an
    order-independent total.

    Shapes: both sides filter on their type at the scan; the pair
    join keys on the user (uniform, per-user bounded) with the range
    as a residual predicate — the bucketed band join in
    ``operators/asof.py`` is the drop-in upgrade if per-user history
    stops being bounded."""
    convs = events.filter(F.col(type_col) == conv_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        F.col(ts_col).alias("__cts"),
    )
    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__tid"),
        F.col(ts_col).alias("__tts"),
    )
    pairs = convs.join(touches, "__u").filter(
        (F.col("__tts") < F.col("__cts"))
        & (
            F.col("__tts")
            > F.col("__cts") - F.expr(f"INTERVAL {int(window_hours)} HOURS")
        )
    )
    sized = pairs.join(
        pairs.groupBy("__cid").agg(F.count(F.lit(1)).alias("__nt")), "__cid"
    )
    credited = sized.select(
        "__tid",
        "__cid",
        F.floor(F.lit(1000000.0) / F.col("__nt")).cast("long").alias("__cm"),
    )
    return credited.groupBy("__tid").agg(
        F.countDistinct("__cid").alias("n_conversions"),
        (F.sum("__cm").cast("double") / F.lit(1000000.0)).alias("credit"),
    ).select(
        F.col("__tid").alias("event_id"), "n_conversions", "credit"
    )
