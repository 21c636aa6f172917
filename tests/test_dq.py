"""Data-quality checks (operators/dq.py)."""

from pyspark.sql import functions as F

from farmrpg_etl_spark.operators.dq import (
    check_counts,
    duplicate_keys,
    fk_violations,
)


def test_fk_violations_surfaces_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = [r.id for r in fk_violations(child, parent, "fk", "pk").collect()]
    assert out == [3]


def test_duplicate_keys_reports_groups(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    out = {(r.k, r.n) for r in duplicate_keys(df, ["k"]).collect()}
    assert out == {(1, 2)}


def test_check_counts_one_scan_many_checks(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 500.0)], "id long, v double"
    )
    out = {r.check: (r.n_checked, r.n_violations) for r in check_counts(
        df,
        {
            "nonnull_v": F.col("v").isNull(),
            "v_le_100": F.col("v") > 100.0,
        },
    ).collect()}
    assert out == {"nonnull_v": (3, 1), "v_le_100": (3, 1)}


def test_check_counts_is_one_scan(spark):
    """The suite's value is fusion: N checks must not become N scans."""
    from farmrpg_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = check_counts(
        ev,
        {
            "a": F.col("value").isNull(),
            "b": F.col("value") > 100.0,
            "c": F.col("event_type") == "error",
        },
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan
