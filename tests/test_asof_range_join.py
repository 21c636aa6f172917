"""As-of and range-join operator semantics: boundary inclusivity,
deterministic tie-breaks, tolerance voiding, forward direction, and the
no-cartesian plan guarantee."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from farmrpg_etl_spark.operators.asof import asof_join, range_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p10"), (1, _ts(20), "p20"), (2, _ts(5), "p5")],
        "k int, lts timestamp, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100, "r@10"),   # exactly at p10 — inclusive
            (1, _ts(10), 101, "r@10b"),  # same ts, higher id wins ties
            (1, _ts(15), 102, "r@15"),
            (1, _ts(25), 103, "r@25"),   # after both probes
            (3, _ts(1), 104, "other-key"),
        ],
        "k int, rts timestamp, rid int, rname string",
    )
    return left, right


def test_backward_inclusive_and_tiebreak(spark, sides):
    left, right = sides
    out = asof_join(left, right, "k", "lts", "rts", tiebreak="rid")
    rows = {r.lname: (r.rid, r.rname) for r in out.collect()}
    # p10 matches ts=10 (inclusive); tie between rid 100/101 → highest rid
    assert rows["p10"] == (101, "r@10b")
    assert rows["p20"] == (102, "r@15")
    assert rows["p5"] == (None, None)  # key 2 has no right rows (left join)


def test_inner_drops_unmatched(spark, sides):
    left, right = sides
    out = asof_join(left, right, "k", "lts", "rts", tiebreak="rid", how="inner")
    assert {r.lname for r in out.collect()} == {"p10", "p20"}


def test_forward_direction(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, "k", "lts", "rts", tiebreak="rid", direction="forward"
    )
    rows = {r.lname: r.rid for r in out.collect()}
    # forward ties pick the SMALLEST tiebreak at the earliest rts >= lts
    assert rows["p10"] == 100
    assert rows["p20"] == 103


def test_tolerance_voids_stale_matches(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, "k", "lts", "rts", tiebreak="rid", tolerance_sec=3
    )
    rows = {r.lname: r.rid for r in out.collect()}
    assert rows["p10"] == 101  # gap 0 ≤ 3s
    assert rows["p20"] is None  # gap 5s > 3s → voided, row kept (left)


def test_asof_matches_naive_formulation(spark, sides):
    """Window formulation == naive inequality-join + row_number."""
    left, right = sides
    fast = asof_join(left, right, "k", "lts", "rts", tiebreak="rid", how="inner")
    naive = (
        left.join(right, "k")
        .filter(F.col("rts") <= F.col("lts"))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("k", "lname")
                .orderBy(F.col("rts").desc(), F.col("rid").desc())
            ),
        )
        .filter("rn = 1")
        .select("k", "lts", "lname", "rts", "rid", "rname")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_asof_rejects_colliding_names(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("rts", "lts"), "k", "lts", "lts")
    with pytest.raises(ValueError):
        asof_join(
            left, right.withColumnRenamed("rname", "lname"), "k", "lts", "rts"
        )


def test_range_join_halfopen_band(spark, sides):
    left, right = sides
    # band [lts-10s, lts): strictly-before within 10 seconds
    pairs = range_join(left, right, "k", "lts", "rts", -10.0, 0.0)
    got = sorted((r.lname, r.rid) for r in pairs.collect())
    # p10: rts=10 excluded (upper exclusive); p20: 10,11? → 10(×2),15 in [10,20)
    assert got == [("p20", 100), ("p20", 101), ("p20", 102)]


def test_range_join_lower_inclusive(spark, sides):
    left, right = sides
    # band [lts-5s, lts+1s): p20-5 = 15 exactly → included
    pairs = range_join(left, right, "k", "lts", "rts", -5.0, 1.0)
    got = sorted((r.lname, r.rid) for r in pairs.collect())
    assert ("p20", 102) in got and ("p10", 100) in got and ("p10", 101) in got


def test_range_join_no_duplicate_pairs_across_buckets(spark, sides):
    left, right = sides
    # tiny bucket (1s) → each probe spans many buckets; pairs still unique
    pairs = range_join(left, right, "k", "lts", "rts", -10.0, 0.0, bucket_sec=1.0)
    got = [(r.lname, r.rid) for r in pairs.collect()]
    assert len(got) == len(set(got)) == 3


def test_range_join_plan_has_no_cartesian(spark, sides):
    left, right = sides
    plan = (
        range_join(left, right, "k", "lts", "rts", -10.0, 0.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
