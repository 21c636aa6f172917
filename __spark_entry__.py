"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``farmrpg_etl_spark.queries`` (Spark side)
and ``farmrpg_etl_spark.oracles`` (DuckDB side); this module only
adapts them to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue-by-nation join-agg at sf0.001."""
    from farmrpg_etl_spark.queries import revenue_by_nation

    return revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from farmrpg_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from farmrpg_etl_spark.oracles import ORACLES

    return dict(ORACLES)
