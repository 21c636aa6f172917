"""Batch table sources.

Parquet scans are the engine's primary batch source. We rely on
Catalyst for predicate pushdown / column pruning — callers `select`
and `filter` on the returned DataFrame and the scan narrows
accordingly (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``). At cluster scale, big fact
tables (lineitem/orders/events) should be written partitioned by
date and bucketed by join key; see ``farmrpg_etl_spark.sinks``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from farmrpg_etl_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
