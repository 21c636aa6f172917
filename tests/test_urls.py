"""URL canonicalization (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.urls import canonicalize_url


def canon(spark, url):
    (row,) = (
        spark.range(1).select(canonicalize_url(F.lit(url)).alias("c")).collect()
    )
    return row.c


@pytest.mark.parametrize(
    "url,expected",
    [
        # scheme+host lowercase, default port stripped, www stripped
        ("HTTPS://WWW.Site.COM:443/A/b", "https://site.com/A/b"),
        ("HTTP://site.com:80/x", "http://site.com/x"),
        # non-default port preserved
        ("https://site.com:8443/x", "https://site.com:8443/x"),
        # :80 is not https' default; :443 is not http's
        ("https://site.com:80/x", "https://site.com:80/x"),
        # empty path -> /, trailing slash stripped (root stays /)
        ("https://site.com", "https://site.com/"),
        ("https://site.com/a/", "https://site.com/a"),
        ("https://site.com/", "https://site.com/"),
        # fragment dropped
        ("https://site.com/a#frag", "https://site.com/a"),
        # tracking params stripped, survivors sorted
        (
            "https://site.com/a?z=1&utm_source=x&a=2&ref=feed&fbclid=q",
            "https://site.com/a?a=2&z=1",
        ),
        # all-tracking query -> no '?'
        ("https://site.com/a?utm_campaign=x&gclid=1", "https://site.com/a"),
        # utm prefix only matches param NAME (utm_x=...), not values
        ("https://site.com/a?q=utm_source", "https://site.com/a?q=utm_source"),
        # path case preserved (paths are case-sensitive)
        ("https://site.com/CaseSensitive", "https://site.com/CaseSensitive"),
    ],
)
def test_canonical_forms(spark, url, expected):
    assert canon(spark, url) == expected


def test_no_scheme_is_null(spark):
    assert canon(spark, "not a url") is None
    assert canon(spark, "site.com/a") is None


def test_canonicalization_is_idempotent(spark):
    """canon(canon(u)) == canon(u): the canonical form must be a fixed
    point, else URL-level dedup depends on how many times a crawler
    normalized before us."""
    from pyspark.sql import functions as F

    urls = [
        "HTTPS://WWW.Site.COM:443/A/b/?utm_source=x&z=1&a=2#f",
        "http://site.com:80/",
        "https://site.com:8443/Case/Path?b=2&a=1",
        "https://www.example.org/a/b/c/?gclid=1",
        "https://example.org",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c2 == r.c1, (r.c1, r.c2)
