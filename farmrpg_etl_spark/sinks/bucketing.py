"""Bucketed-table layout for co-located joins (SCALE.md).

At 100 TB the dominant shuffle is the fact-fact equi-join
(lineitem ⋈ orders on orderkey). Writing both tables bucketed by the
join key makes the join shuffle-free forever after: each bucket pair
joins locally, and Catalyst drops the Exchange on both sides. The
write itself pays one shuffle — amortized across every subsequent
join, the standard warehouse-layout trade.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed table (parquet).

    ``num_buckets`` should match the cluster's target parallelism per
    table; bucket counts must be equal on both sides of a co-located
    join."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket key skip their Exchange)."""
    return spark.table(name)
