"""Document chunking — overlapping token windows for training pipelines.

Splits each document into fixed-size token windows with a configurable
stride (overlap = size - stride), the standard pre-tokenization shape
for LLM training data. Pure Catalyst expressions: tokenize once,
``sequence``/``explode`` the window starts, ``slice`` each window out
of the cached token array. No UDFs, no shuffle — chunking is a narrow
1→N flatMap, so it composes with downstream dedup/quality stages
without repartitioning.

At 100 TB the only cost is output volume (overlap factor ×
corpus size); the operator itself is embarrassingly parallel per input
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.hashing import words

__all__ = ["chunk_by_tokens"]


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode ``df`` into ``(id, chunk_id, n_chunk_tokens, chunk)``
    rows of ``size``-token windows every ``stride`` tokens (the last
    window may be shorter; a document shorter than ``size`` yields one
    window). ``chunk_id`` is 0-based and dense per document."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # NULL text behaves like an empty document (one empty window),
    # not a dropped row — curation pipelines count every input.
    toks = F.coalesce(words(F.col(text_col)), F.array().cast("array<string>"))
    n = F.size(toks)
    # n_chunks = ceil(max(n - size, 0) / stride) + 1, via exact integer math
    last_idx = F.floor(
        (F.greatest(n - F.lit(size), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_id"),
    )
    chunk_toks = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, size)
    return base.select(
        id_col,
        "chunk_id",
        F.size(chunk_toks).alias("n_chunk_tokens"),
        F.array_join(chunk_toks, " ").alias("chunk"),
    )
