"""Batch forms of the reference's stateful change-detection operators
(SURVEY.md §2.4 D1/D4/D5). Streaming forms live in
``farmrpg_etl_spark.streaming``.

The batch forms are expressed with LAG windows: one shuffle on the
key, whole-stage codegen throughout. At scale the key (room,id /
user_id) is high-cardinality and unskewed, so the window shuffle
partitions evenly; no salting needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _change_predicate(compare_cols: Sequence[str]):
    """True when any compared column differs from its LAG (null-safe)."""
    pred = None
    for c in compare_cols:
        diff = ~F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
        pred = diff if pred is None else pred | diff
    return pred


def changes(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """D1 batch form — new-or-changed detection per key.

    Reference semantics (scrapers/chat.py:158-171): keep last observed
    row per (room, id); emit only rows that are new or differ on any
    compared column. Batch analog: per-key LAG compare; the first
    observation per key is always a change.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    out = df
    for c in compare_cols:
        out = out.withColumn(f"__prev_{c}", F.lag(F.col(c)).over(w))
    is_first = F.lag(F.col(order_col)).over(w).isNull()
    out = out.withColumn("__is_change", is_first | _change_predicate(compare_cols))
    return out.filter(F.col("__is_change")).drop(
        "__is_change", *[f"__prev_{c}" for c in compare_cols]
    )


def deleted_transitions(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    deleted_col: str = "deleted",
) -> DataFrame:
    """D1's deleted-transition stamping, batch form.

    Reference (scrapers/chat.py:158-169): on a deleted False→True
    transition, stamp deleted_ts with the observation time; once
    stamped, deleted_ts is carried forward on every later observation
    of the key — including un-deleted ones (the reference copies
    ``last_msg.deleted_ts`` unconditionally before comparing), and a
    re-delete flip re-stamps. Batch analog: deleted_ts = most recent
    flip observation time, carried unconditionally.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    # no default: a key whose FIRST observation is already deleted is
    # not a transition we witnessed — the reference leaves deleted_ts
    # null there (stamp requires prior state, chat.py:163-168)
    prev_deleted = F.lag(F.col(deleted_col)).over(w)
    flip = F.col(deleted_col) & ~prev_deleted
    stamped = df.withColumn(
        "__flip_ts", F.when(flip, F.col(order_col)).cast("timestamp")
    )
    carry = Window.partitionBy(*keys).orderBy(F.col(order_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return stamped.withColumn(
        "deleted_ts", F.last(F.col("__flip_ts"), ignorenulls=True).over(carry)
    ).drop("__flip_ts")


def noop_eliminate(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    volatile_cols: Sequence[str] = (),
) -> DataFrame:
    """D4 batch form — snapshot no-op elimination.

    Reference (db/user.py:12-40): before persisting a snapshot, diff it
    against the latest prior snapshot ignoring volatile fields
    (user, ts); skip the write when equal. Batch analog: keep rows
    where any non-volatile column differs from the previous row of the
    key (first row always kept).
    """
    compare = [
        c for c in df.columns if c not in keys and c != order_col and c not in volatile_cols
    ]
    return changes(df, keys, order_col, compare)


def message_cdc(
    df: DataFrame,
    keys: Sequence[str] = ("room", "id"),
    order_col: str = "obs_ts",
    deleted_col: str = "deleted",
) -> DataFrame:
    """D1 full reference semantics, batch form (scrapers/chat.py:158-171).

    Per key (room, id), over observations ordered by ``order_col``:

    1. ``deleted_ts`` is stamped with the observation time of each
       False→True flip of ``deleted_col`` and carried forward while
       deleted (the reference carries it from prior state *before* the
       equality compare, so it never causes a spurious change);
    2. a row is emitted iff it is the key's first observation or any
       payload column other than ``deleted_ts`` changed — ``deleted``
       itself participates (a flip emits), ``deleted_ts`` never does.

    Documented divergence: the reference replaces its per-poll state
    wholesale (chat.py:171), so a message that drops out of a payload
    and later reappears unchanged re-emits. Keyed CDC state never
    forgets, so reappearing unchanged rows do NOT re-emit here.
    """
    stamped = deleted_transitions(df, keys, order_col, deleted_col)
    compare = [
        c for c in stamped.columns
        if c not in keys and c != order_col and c != "deleted_ts"
    ]
    return changes(stamped, keys, order_col, compare)


def change_pairs(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """D5 input — (new, previous) pairs for changed rows, exposing
    ``prev_<col>`` columns (reference emits new_user_snapshot(snap,
    last_snap), db/user.py:39-40; claims gate firestore/user.py:7-13)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    out = df
    for c in compare_cols:
        out = out.withColumn(f"prev_{c}", F.lag(F.col(c)).over(w))
    # window exprs can't live in a WHERE clause — materialize first
    out = out.withColumn("__prev_order", F.lag(F.col(order_col)).over(w))
    pred = F.col("__prev_order").isNull()
    for c in compare_cols:
        pred = pred | ~F.col(c).eqNullSafe(F.col(f"prev_{c}"))
    return out.filter(pred).drop("__prev_order")
