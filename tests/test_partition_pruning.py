"""Partitioned-layout proof: a date-partitioned parquet sink plus a
scan whose date filter is satisfied by partition pruning — the predicate
lands in PartitionFilters (directory-level pruning before any file is
opened) with an empty DataFilters, i.e. no row is read then discarded.
This is the layout a 100 TB events table ships with: daily partitions,
so a date-range query reads only those days' files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _filescan_line(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return next(l for l in plan.splitlines() if "FileScan" in l)


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_day"))
    from farmrpg_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(path)
    return path


def test_partition_filter_reaches_scan(spark, part_dir):
    scan = _filescan_line(
        spark.read.parquet(part_dir).filter(F.col("day") == "2024-01-15")
    )
    part_filters = scan.split("PartitionFilters:")[1].split("]")[0]
    data_filters = scan.split("DataFilters:")[1].split("]")[0]
    assert "day" in part_filters  # pruned at directory level
    assert data_filters.strip(" [") == ""  # nothing filtered post-read


def test_pruned_scan_equals_direct_partition_read(spark, part_dir):
    pruned = spark.read.parquet(part_dir).filter(F.col("day") == "2024-01-15")
    direct = spark.read.parquet(part_dir + "/day=2024-01-15")
    assert pruned.count() == direct.count() > 0


def test_non_partition_filter_stays_in_datafilters(spark, part_dir):
    scan = _filescan_line(
        spark.read.parquet(part_dir).filter(F.col("event_type") == "click")
    )
    pushed = scan.split("PushedFilters:")[1].split("]")[0]
    assert "event_type" in pushed  # parquet row-group pushdown, not pruning


def test_range_predicate_prunes(spark, part_dir):
    scan = _filescan_line(
        spark.read.parquet(part_dir).filter(
            (F.col("day") >= "2024-01-10") & (F.col("day") < "2024-01-12")
        )
    )
    part_filters = scan.split("PartitionFilters:")[1].split("]")[0]
    assert ">=" in part_filters and "<" in part_filters
