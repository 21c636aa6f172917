"""Unit tests for robots-rule URL filtering (`operators/crawl.py`) —
RFC 9309 matching: longest prefix wins, allow wins ties, no-match
allows."""

from __future__ import annotations

from farmrpg_etl_spark.operators.crawl import robots_filter

RULES = [
    ("a.com", "/private", False),
    ("a.com", "/private/pub", True),   # longer allow carve-out
    ("a.com", "/tmp", False),
    ("a.com", "/tmpx", True),          # tie-length probe vs /tmp on /tmpx...
    ("b.com", "/", False),             # whole-host disallow
]


def _decide(spark, url_rows):
    urls = spark.createDataFrame(
        url_rows, "doc_id long, host string, path string"
    )
    rules = spark.createDataFrame(RULES, "host string, prefix string, allow boolean")
    return {
        r["doc_id"]: (r["allowed"], r["matched_len"])
        for r in robots_filter(urls, rules).collect()
    }


def test_longest_prefix_wins(spark):
    got = _decide(
        spark,
        [
            (1, "a.com", "/private/data"),       # /private (7) -> deny
            (2, "a.com", "/private/pub/data"),   # /private/pub (12) -> allow
            (3, "a.com", "/open/page"),          # no rule -> allow
        ],
    )
    assert got[1] == (False, 8)
    assert got[2] == (True, 12)
    assert got[3] == (True, 0)


def test_allow_wins_specificity_tie(spark):
    # /tmpx matches both /tmp (4, deny) and /tmpx (5, allow): longest
    # wins; craft a true tie with equal-length opposing rules
    rows = [(1, "a.com", "/tmpxy")]
    got = _decide(spark, rows)
    assert got[1] == (True, 5)


def test_true_equal_length_tie_allows(spark):
    urls = [(1, "c.com", "/x/page")]
    import pyspark.sql.functions as F  # noqa: F401

    rules = [("c.com", "/x", False), ("c.com", "/x", True)]
    u = _decide_with(urls, rules)
    assert u[1] == (True, 2)


def test_whole_host_disallow(spark):
    got = _decide(spark, [(1, "b.com", "/anything"), (2, "z.com", "/anything")])
    assert got[1] == (False, 1)
    assert got[2] == (True, 0)   # unknown host: no rules, allowed


def _decide_with(url_rows, rule_rows):
    from farmrpg_etl_spark.session import get_spark

    spark = get_spark("tests")
    urls = spark.createDataFrame(url_rows, "doc_id long, host string, path string")
    rules = spark.createDataFrame(rule_rows, "host string, prefix string, allow boolean")
    return {
        r["doc_id"]: (r["allowed"], r["matched_len"])
        for r in robots_filter(urls, rules).collect()
    }


def test_broadcast_in_plan(spark):
    urls = spark.createDataFrame(
        [(1, "a.com", "/p")], "doc_id long, host string, path string"
    )
    rules = spark.createDataFrame(RULES, "host string, prefix string, allow boolean")
    plan = robots_filter(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
