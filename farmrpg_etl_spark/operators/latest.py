"""Latest-per-key (A1) — the reference's single most-used query shape:
``objects(UserSnapshot).order_by("-ts").first(user__id=N)``
(reference db/user.py:17, api/auth.py:44-46, test/models/test_user.py:38-40).

Two physical strategies:

* ``latest_per_key`` — window ``row_number() == 1``; one shuffle on the
  key, safe default, AQE handles skew.
* ``latest_per_key_agg`` — ``max_by``-style struct-max aggregation;
  map-side partial aggregation makes this the cheaper plan when the
  value payload is narrow (it avoids sorting whole partitions). At
  100 TB prefer this form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-1 per key by ``order_col`` DESC (deterministic with tiebreak)."""
    ordering = [F.col(order_col).desc()] + [F.col(t).desc() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Same semantics via max(struct(order, tiebreak..., payload)) —
    partial-aggregatable, no per-partition sort."""
    ordered_cols = [order_col, *tiebreak]
    payload = [c for c in df.columns if c not in keys and c not in ordered_cols]
    packed = F.struct(*[F.col(c) for c in ordered_cols], *[F.col(c) for c in payload])
    agg = df.groupBy(*keys).agg(F.max(packed).alias("__top"))
    out = agg.select(
        *keys,
        *[F.col(f"__top.{c}").alias(c) for c in ordered_cols],
        *[F.col(f"__top.{c}").alias(c) for c in payload],
    )
    return out.select(*df.columns)
