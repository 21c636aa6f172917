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


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Distributed prefix sum: ``out_col`` = running total of
    ``value_col`` in ``order_col`` order (inclusive), without the
    single-partition collapse of a global ``Window.orderBy``.

    Two-phase prefix-sum over DETERMINISTIC key-range buckets: the
    bucket id is computed from the key's value and the (min, max) key
    range — never from ``spark_partition_id`` — so re-computation of
    any branch can't shift bucket boundaries (a physical-partition-id
    scheme silently corrupts offsets if the exchange isn't reused).
    Phase 1 cumsums inside each bucket (parallel windows); phase 2
    turns the per-bucket totals (one row per bucket) into exclusive
    offsets with a window over that tiny frame and broadcasts them
    back. At 100 TB this is the only scale-safe way to assign global
    offsets — a bare ``Window.orderBy(order_col)`` pulls the corpus
    through ONE task.

    ``order_col`` must be a unique integral key (ties would make the
    intra-tie cumsum order nondeterministic); bucket balance follows
    the key distribution (dense ids -> uniform buckets)."""
    from pyspark.sql import Window

    nb = int(
        num_buckets
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # the input is consulted by four subtrees (key range, local cumsum,
    # bucket totals, offset join) — persist it so an expensive upstream
    # pipeline is computed once, not four times (the frame is narrow:
    # callers pass (key, value) projections; spills to disk if large)
    df = df.persist()
    key = F.col(order_col).cast("long")
    rng = df.agg(
        F.min(key).alias("__mn"), F.max(key).alias("__mx")
    )
    span = F.col("__mx") - F.col("__mn") + 1
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "__b", ((key - F.col("__mn")) * nb / span).cast("long")
    )
    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__local", F.sum(F.col(value_col)).over(w_local))
    # one row per bucket: the global window here is over <= nb rows.
    # bucket total = SUM of the values (max(running sum) is only correct
    # for non-negative values — same fix as grouped_prefix_sum)
    totals = local.groupBy("__b").agg(F.sum(F.col(value_col)).alias("__total"))
    w_off = Window.orderBy(F.col("__b").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__total").over(w_off) - F.col("__total")
    ).select("__b", "__offset")
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__b", "__mn", "__mx", "__local", "__offset")
    )


def pack_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    seq_len: int = 2048,
) -> DataFrame:
    """Concat-and-split sequence packing (the standard LLM training
    layout): documents are laid end-to-end in ``id_col`` order and the
    token stream is cut into ``seq_len``-token training sequences, so
    a document may span several packs. Emits per document its global
    token offset and the first/last pack it lands in.

    The global offset comes from :func:`global_prefix_sum` — no
    single-partition window, no collect of the corpus."""
    toks = F.coalesce(words(F.col(text_col)), F.array().cast("array<string>"))
    base = df.select(F.col(id_col), F.size(toks).alias("n_tokens"))
    cum = global_prefix_sum(base, id_col, "n_tokens", "cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        F.floor(start / F.lit(seq_len)).alias("first_pack"),
        # empty docs occupy no tokens: their pack span is their start pack
        F.floor(
            F.greatest(F.col("cum_tokens") - 1, start) / F.lit(seq_len)
        ).alias("last_pack"),
    )


def pack_schedule(
    assembled: DataFrame,
    id_col: str,
    source_col: str,
    *,
    seq_len: int = 512,
) -> DataFrame:
    """Materialize a REPLICATION SCHEDULE (``unimax_assemble``'s
    ``(id, source, n_tok, n_copies)``) into the packed training
    layout: every (document, copy) occupies ``n_tok`` tokens at a
    global offset in one deterministic globally-shuffled stream —
    order key ``md5(source|id|copy)``, so copies of a document and
    documents of a source spread uniformly through the epoch instead
    of clumping (the shuffling a training run wants), yet the layout
    is bit-reproducible. The stream is cut into ``seq_len``-token
    packs; emits per copy its offset and first/last pack.

    Output: ``(id, source, copy, n_tok, start_offset, first_pack,
    last_pack)`` with ``copy`` ∈ 1..n_copies.

    Scale: the copy expansion is a narrow 1→N flatMap; the global
    offset comes from :func:`grouped_prefix_sum` with no group (256
    order-aligned md5-prefix buckets), so a 100 TB schedule cumsums
    across all executors — no single-partition window, no collect."""
    rows = assembled.filter(F.col("n_copies") > 0).select(
        F.col(id_col),
        F.col(source_col),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
        ).alias("copy"),
    )
    rows = rows.withColumn(
        "__ord",
        F.md5(
            F.concat_ws(
                "|",
                F.col(source_col),
                F.col(id_col).cast("string"),
                F.col("copy").cast("string"),
            )
        ),
    )
    cum = grouped_prefix_sum(rows, [], "__ord", "n_tok", "cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tok")
    return cum.select(
        id_col,
        source_col,
        "copy",
        "n_tok",
        start.cast("long").alias("start_offset"),
        F.floor(start / F.lit(seq_len)).cast("long").alias("first_pack"),
        # zero-token copies occupy no tokens: their span is their start
        F.floor(
            F.greatest(F.col("cum_tokens") - 1, start) / F.lit(seq_len)
        )
        .cast("long")
        .alias("last_pack"),
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_chars: int = 2,
) -> DataFrame:
    """Per-group running total of ``value_col`` in ``order_col`` order,
    without a per-group single-partition window — the grouped twin of
    :func:`global_prefix_sum` for when groups are few but huge (a
    dominant corpus source must not serialize through one task).

    ``order_col`` must be a uniformly-distributed string key (an md5
    hex digest) unique within its group: the bucket id is its leading
    ``bucket_chars`` characters, which are order-ALIGNED ranges of the
    string order (a hash-of-key bucket would scatter the order and
    corrupt the sum). Phase 1 cumsums inside (group, bucket); phase 2
    computes exclusive bucket offsets over the tiny
    (groups × 16^bucket_chars)-row totals frame and broadcasts them
    back."""
    from pyspark.sql import Window

    b = F.substring(F.col(order_col), 1, bucket_chars)
    w_local = (
        Window.partitionBy(*group_cols, "__b")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("__b", b).withColumn(
        "__local", F.sum(F.col(value_col)).over(w_local)
    )
    # bucket total = SUM of the values, never max(running sum): the
    # running local cumsum is only monotone for non-negative values, so
    # max(__local) under-counts buckets containing negatives (hypothesis
    # r5 counterexample: values (-1, 0) -> bucket total 0, not -1)
    totals = local.groupBy(*group_cols, "__b").agg(
        F.sum(F.col(value_col)).alias("__total")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__total").over(w_off) - F.col("__total")
    ).select(*group_cols, "__b", "__offset")
    return (
        local.join(F.broadcast(offsets), [*group_cols, "__b"])
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__b", "__local", "__offset")
    )


def content_defined_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """Content-defined chunking: boundaries where the rolling Horner
    hash of the last ``window`` bytes ≡ 0 (mod ``modulus``) — average
    chunk ≈ modulus bytes. Unlike fixed-size chunking
    (:func:`chunk_by_tokens` / ``dedup.dedup_duplicated_chunks``), an
    edit only perturbs the chunks that OVERLAP it: boundaries are a
    pure function of local content, so all downstream chunk digests
    realign after the edit window — the property that makes sub-
    document dedup survive boilerplate insertions at corpus scale.

    Entirely Catalyst: per-position hashes are a ``transform`` over a
    position sequence with an unrolled left-associated Horner chain
    (base 131 over ``window`` ASCII codes — max intermediate ≈ 8.5e16,
    exact in a long, no overflow, no mod until the boundary test), so
    the DuckDB oracle reproduces every boundary bit-for-bit. Output:
    one row per chunk ``(id, chunk_idx, start, length, digest)``;
    ``start`` is a 0-based byte offset into the sanitized text.

    Scale: narrow 1→N per-row computation, no shuffle at all; the
    downstream first-occurrence dedup is one groupBy on the digest.
    """
    s = F.regexp_replace(F.col(text_col), r"[^\x20-\x7e]", "")
    out = df.select(F.col(id_col), s.alias("__s")).filter(F.length("__s") > 0)
    out = out.withColumn("__n", F.length("__s"))
    codes = F.transform(
        F.slice(F.split(F.col("__s"), ""), 1, F.col("__n")),
        lambda c: F.ascii(c).cast("long"),
    )
    out = out.withColumn("__codes", codes)

    def horner(i):
        h = F.element_at(F.col("__codes"), (i - F.lit(window - 1)).cast("int"))
        for k in range(window - 2, -1, -1):
            h = h * F.lit(131) + F.element_at(
                F.col("__codes"), (i - F.lit(k)).cast("int")
            )
        return h

    positions = F.when(
        F.col("__n") >= window,
        F.sequence(F.lit(window), F.col("__n")),
    ).otherwise(F.array().cast("array<int>"))
    bpos = F.filter(
        F.transform(positions, lambda i: i.cast("long")),
        lambda i: horner(i) % modulus == 0,
    )
    cuts = F.array_sort(
        F.array_distinct(
            F.concat(
                F.array(F.lit(0).cast("long")), bpos,
                F.array(F.col("__n").cast("long")),
            )
        )
    )
    spans = F.transform(
        F.sequence(F.lit(1), F.size(cuts) - 1),
        lambda j: F.struct(
            F.element_at(cuts, j).alias("start"),
            (F.element_at(cuts, j + 1) - F.element_at(cuts, j)).alias("length"),
        ),
    )
    out = out.select(
        F.col(id_col), "__s", F.posexplode(spans).alias("chunk_idx", "__sp")
    )
    return out.select(
        F.col(id_col),
        "chunk_idx",
        F.col("__sp.start").alias("start"),
        F.col("__sp.length").alias("length"),
        F.md5(
            F.encode(
                F.substr(
                    F.col("__s"),
                    (F.col("__sp.start") + 1).cast("int"),
                    F.col("__sp.length").cast("int"),
                ),
                "UTF-8",
            )
        ).alias("digest"),
    )


def pack_token_ids(
    sched: DataFrame,
    enc: DataFrame,
    id_col: str,
    *,
    seq_len: int = 512,
) -> DataFrame:
    """Materialize pack CONTENTS from a :func:`pack_schedule` layout
    and a per-document token-id relation (``curation.bpe_encode``'s
    ``(id, token_ids)``): every (document, copy) span is cut at pack
    boundaries and each pack reassembles its segments in
    stream-offset order — the packed shards now carry the actual
    ``array<long>`` token sequences a training run consumes, not just
    counts. Emits ``(pack_id, n_tokens, n_segs, token_ids)``; every
    pack is exactly ``seq_len`` tokens except the stream's last.

    ``sched.n_tok`` must equal ``size(enc.token_ids)`` per document
    (build the schedule FROM the encoding — the registry row does).

    Scale shape: the join to the id arrays is on the document key
    (one shuffle, arrays ride the rows once per copy); the
    pack-boundary explode is a narrow 1→≤(n_tok/seq_len + 1) flatMap;
    the regroup shuffles each token id exactly once on the pack key.
    Zero-token copies are excluded up front — they occupy no tokens,
    and keeping them would put tied ``start_offset`` values into the
    per-pack segment sort (cross-engine order would then depend on
    array comparison instead of a unique key)."""
    rows = sched.filter(F.col("n_tok") > 0).join(
        enc.select(F.col(id_col), "token_ids"), id_col
    )
    spans = rows.select(
        "start_offset",
        "n_tok",
        "token_ids",
        F.explode(
            F.sequence(F.col("first_pack"), F.col("last_pack"))
        ).alias("pack_id"),
    )
    s = F.greatest(F.col("pack_id") * seq_len, F.col("start_offset"))
    e = F.least(
        (F.col("pack_id") + 1) * seq_len,
        F.col("start_offset") + F.col("n_tok"),
    )
    segs = spans.select(
        "pack_id",
        "start_offset",
        F.slice(
            F.col("token_ids"),
            (s - F.col("start_offset") + 1).cast("int"),
            (e - s).cast("int"),
        ).alias("seg"),
    )
    return (
        segs.groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("start_offset"), F.col("seg")))
            ).alias("__segs")
        )
        .select(
            "pack_id",
            F.flatten(
                F.transform(F.col("__segs"), lambda x: x["seg"])
            ).alias("token_ids"),
            F.size("__segs").cast("long").alias("n_segs"),
        )
        .select(
            "pack_id",
            F.size("token_ids").cast("long").alias("n_tokens"),
            "n_segs",
            "token_ids",
        )
    )
