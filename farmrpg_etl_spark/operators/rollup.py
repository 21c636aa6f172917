"""Grouped aggregation / window / set-op surface.

The reference computes no grouped aggregations (SURVEY.md §2.6) —
Spark ships them built-in and our engine exposes them as first-class
query shapes (they're also the bench headliners). Everything here is
partial-aggregatable (map-side combine) and AQE-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, F.Column]) -> DataFrame:
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def topk_by(
    df: DataFrame, keys: Sequence[str], metric: F.Column, k: int, metric_name: str = "metric"
) -> DataFrame:
    return (
        df.groupBy(*keys)
        .agg(metric.alias(metric_name))
        .orderBy(F.col(metric_name).desc(), *[F.col(c).asc() for c in keys])
        .limit(k)
    )


def running_total(
    df: DataFrame, keys: Sequence[str], order_col: str, value_col: str, out_col: str
) -> DataFrame:
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, F.Column]) -> DataFrame:
    """ROLLUP over keys (subtotals + grand total)."""
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
