"""Filter / predicate operators (SURVEY.md §2.3, F1-F5).

All are plain Catalyst predicates, so they push down into the parquet
scan (check ``PushedFilters`` in ``df.explain('formatted')``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def http_guard(df: DataFrame, status_col: str = "status", body_col: str = "body") -> DataFrame:
    """F1: drop payloads with status != 200 or body == b'no access'
    (reference scrapers/chat.py:144-154)."""
    return df.filter(
        (F.col(status_col) == 200)
        & (F.col(body_col) != F.lit("no access").cast("binary"))
    )


def unread_only(df: DataFrame, unread_col: str = "unread") -> DataFrame:
    """F2: only unread mailbox rows proceed (reference scrapers/mailbox.py:108-110)."""
    return df.filter(F.col(unread_col))


def not_before(df: DataFrame, ts_col: str, start_ts) -> DataFrame:
    """F3: pre-start suppression (reference __main__.py:41-42)."""
    return df.filter(F.col(ts_col) >= F.lit(start_ts))


def equality_lookup(df: DataFrame, **eq) -> DataFrame:
    """F4: ORM-style kwargs equality filter (reference db/chat.py:24-26).

    ``filter(room=..., username=...)`` — conjunctive equality on columns.
    FK-traversing lookups (``user__firebase_uid=``) are the join in
    :func:`farmrpg_etl_spark.operators.joins.fk_lookup`.
    """
    cond: Column | None = None
    for k, v in eq.items():
        c = F.col(k) == F.lit(v)
        cond = c if cond is None else cond & c
    return df.filter(cond) if cond is not None else df


def exact_length(df: DataFrame, col: str, n: int) -> DataFrame:
    """F5: UID shape validation — exactly-n-chars filter
    (reference bots/firebase.py:12-14)."""
    return df.filter(F.length(F.col(col)) == n)


def absent_from(df: DataFrame, sink_state: DataFrame, on) -> DataFrame:
    """D6: existence-cache — keep only rows whose key is absent from the
    sink state (reference seeds an in-memory room-doc id set at startup
    and skips re-creates, firestore/chat.py:28,31-36,52-56).

    Spark form: left-anti join against the sink-state table. At scale
    the sink-state side is projected to the key columns only (column
    pruning) and broadcast when small."""
    keys = [on] if isinstance(on, str) else list(on)
    return df.join(sink_state.select(*keys).distinct(), on=keys, how="left_anti")
