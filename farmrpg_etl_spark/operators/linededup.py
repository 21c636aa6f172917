"""Line-level exact deduplication (RefinedWeb-style).

Web-crawl curation pipelines (Penedo et al., "The RefinedWeb Dataset
for Falcon LLM"; also CCNet's paragraph dedup) remove individual
LINES that repeat across the corpus — navigation chrome, cookie
banners, boilerplate footers — while keeping the documents themselves.
This is distinct from document-level dedup (``operators/dedup.py``):
the unit of removal is the line, and surviving lines are reassembled
into the document in their original order.

Scale shape (100 TB corpus):
* line frequencies are one partial-aggregated shuffle keyed on the
  line text (map-side combine absorbs the hot boilerplate lines);
* only the FREQUENT lines (freq >= min_count) are materialized for
  the removal join — that set is the corpus' boilerplate, orders of
  magnitude smaller than the line population, so the removal is a
  broadcast left-anti join and the corpus is never shuffled on the
  skewed line key;
* reassembly groups by doc id — a uniform key — using a sort of the
  per-doc line positions inside the aggregation, not a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(df: DataFrame, text_col: str, id_col: str, delim: str = "\n") -> DataFrame:
    """One row per line: ``(id, pos, line)``. Empty documents produce
    a single empty line (split semantics), matching the reassembly
    contract ``join(split(t)) == t``."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )


def frequent_lines(
    lines: DataFrame, min_count: int
) -> DataFrame:
    """Distinct lines occurring at least ``min_count`` times across
    the corpus — the boilerplate set. One partial-aggregated shuffle
    on the line key; the result is small (it is the repeated chrome,
    not the corpus) and is intended to be broadcast."""
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("line_freq"))
        .filter(F.col("line_freq") >= F.lit(min_count))
        .select("line", "line_freq")
    )


def remove_frequent_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 2,
    delim: str = "\n",
    boiler: DataFrame | None = None,
) -> DataFrame:
    """Cut every line that appears ``>= min_count`` times corpus-wide
    and reassemble each document from its surviving lines in original
    order. Returns ``(id, n_lines, n_kept, text_out)``; a document
    whose every line is boilerplate survives with ``text_out = ''``
    (curation can filter on ``n_kept`` downstream — this operator
    does not silently drop documents).

    The removal is a broadcast LEFT join against the (small)
    frequent-line set used as a marker, so the corpus sees exactly two
    shuffles: the frequency aggregation (line key, partial-agg
    absorbed) and ONE per-doc aggregation (uniform doc key) that
    computes the census and the reassembly together — n_lines rides
    the aggregation the reassembly already pays for (no third corpus
    scan, no join-back; every document keeps a row because splitting
    even an empty text yields one line).

    Pass a pre-built ``boiler`` relation (a :func:`frequent_lines`
    result) to dedup against a FROZEN line-frequency model — the
    streaming regime, where per-batch decisions must match the batch
    run's global counts; ``min_count`` is then ignored."""
    lines = split_lines(df, text_col, id_col, delim)
    if boiler is None:
        boiler = frequent_lines(lines, min_count)
    boiler = boiler.select("line", F.lit(True).alias("__boiler"))
    marked = lines.join(F.broadcast(boiler), "line", "left")
    keep_struct = F.when(
        F.col("__boiler").isNull(), F.struct("pos", "line")
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(keep_struct).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(keep_struct)),
                lambda s: s["line"],
            ),
            delim,
        ).alias("text_out"),
    )
