"""Crawl-politeness operators: robots.txt-style URL filtering.

A web-scale corpus pipeline must honor (or at least record) robots
rules before a page enters the training set. This module implements
the rule-evaluation half — the REP matching semantics published in
RFC 9309: per host, the matching rule with the LONGEST path prefix
wins; on a specificity tie, ``allow`` wins; a URL matching no rule is
allowed. (Fetching/parsing robots.txt bodies is the deployment-side
fetcher's job — the landing-zone seam, like `sources/http.py`; this
operator consumes the parsed rules relation.)

No reference-repo counterpart — extends the LLM-pipeline surface
(like operators.curation / functions.urls).

Scale design (100 TB): the rules relation is dimension-sized (a few
rules per crawled host) and is BROADCAST — the URL corpus never
shuffles for the join. The longest-match argmax is a single partial
aggregation keyed by the URL row (uniform key, no skew pivot), and
the specificity/allow ordering rides one ``max(struct(...))`` so no
window or second shuffle is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["robots_filter"]


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Decide allow/deny per URL row under RFC 9309 matching.

    ``urls``: one row per URL with ``id_col``, ``host_col``,
    ``path_col`` (use `functions.urls.url_host` / ``url_path`` to
    derive them from raw URLs).
    ``rules``: ``(host, prefix, allow boolean)`` — one row per
    robots rule, already scoped to the relevant user-agent.

    Returns the ``urls`` rows plus ``matched_len`` (longest matching
    prefix length, 0 when no rule matched) and ``allowed``.

    Tie semantics: ``max(struct(len, allow))`` — equal-length rules
    sort the allow=true rule last, so allow wins the tie exactly as
    RFC 9309 §2.2.2 specifies.
    """
    cand = urls.join(
        F.broadcast(rules), urls[host_col] == rules["host"], "inner"
    ).filter(F.col(path_col).startswith(F.col("prefix")))
    winner = cand.groupBy(urls[id_col].alias("__id")).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").alias("a"),
            )
        ).alias("__w")
    )
    out = urls.join(winner, urls[id_col] == winner["__id"], "left")
    return out.select(
        *[urls[c] for c in urls.columns],
        F.coalesce(F.col("__w.l"), F.lit(0)).cast("long").alias("matched_len"),
        F.coalesce(F.col("__w.a"), F.lit(True)).alias("allowed"),
    )
