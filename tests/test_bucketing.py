"""Bucketed-join layout: the whole point is the missing Exchange."""

from __future__ import annotations

from farmrpg_etl_spark.sinks.bucketing import read_table, write_bucketed
from farmrpg_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", str(tmp_path / "li"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "o_b", str(tmp_path / "o"), ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lb, ob = read_table(spark, "li_b"), read_table(spark, "o_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout co-locates the join
        # and it still computes the right thing
        assert joined.count() == li.count()
        # contrast: the unbucketed join shuffles both sides
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
