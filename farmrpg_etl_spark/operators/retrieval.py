"""Sparse text retrieval — BM25 top-k over a document corpus.

The training-data counterpart of the dense ANN family
(``operators/similarity.py``): given a small query set, rank documents
by a BM25 lexical score and keep the top ``k`` per query. Used in
curation for eval-set leakage triage (which corpus documents are
lexically closest to a benchmark question) and for targeted corpus
slicing.

Cross-engine exactness: classic BM25 multiplies a logarithmic IDF into
each term's contribution; ``log`` is a transcendental whose last-ulp
value can differ between engines, which would break hash-parity with
the DuckDB oracle. This operator therefore uses the RATIONAL idf core
``(N - df + 0.5) / (df + 0.5)`` (the argument of the classic
``log``-idf, strictly monotone in it), so per-term scores stay in plain
IEEE double arithmetic that both engines evaluate identically; the
per-term contributions are quantized to 1e-6 and decimal-summed
(``functions.exact.dec_sum`` discipline) so the final score is
order-independent. Documented as "BM25 (rational-idf variant)".

NOT order-equivalent to log-idf BM25 for MULTI-term queries: each
term's score is monotone in its log-idf twin, but the per-document SUM
of rational idfs weighs a rare term ~N where classic BM25 weighs it
~log N, so a single very-rare-term hit can outrank several
moderately-rare matches that log-idf BM25 would place first. Rankings
(not just raw scores) can therefore diverge on multi-term queries;
treat this operator as a rare-term-emphasised BM25 family member. For
classic ordering at the cost of cross-engine hash parity, swap ``idf``
below for ``F.log((N - df + 0.5) / (df + 0.5) + 1.0)``.

Scale shape (100 TB corpus, small query set):

* the query term table is tiny → broadcast; the corpus's exploded
  token instances are FILTERED BY BROADCAST SEMI-JOIN before any
  aggregation, so only instances of query terms (a vanishing corpus
  fraction) ever reach a shuffle.
* per-(doc, term) tf and per-term df aggregate with map-side partial
  combine on those surviving rows.
* document length and the corpus-wide (N, avgdl) scalars come from a
  lengths-only projection — one agg over longs, broadcast back.
* the final per-query top-k uses the row_number window Spark 4 plans
  as ``WindowGroupLimit`` — each map task keeps k rows per query
  before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.hashing import words


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (rational-idf variant).

    Returns ``(query_id, doc id, score, rank)`` with rank 1-based by
    ``(score desc, id asc)`` on the 1e-6-rounded score.
    """
    toks = F.coalesce(words(F.col(text_col)), F.array().cast("array<string>"))
    lens = docs.select(F.col(id_col), F.size(toks).alias("__dl"))
    corp = lens.agg(
        F.count(F.lit(1)).alias("__N"),
        F.sum(F.col("__dl").cast("long")).alias("__sumdl"),
    )

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(
                F.coalesce(
                    words(F.col(query_text_col)),
                    F.array().cast("array<string>"),
                )
            )
        ).alias("__t"),
    )

    inst = docs.select(F.col(id_col), F.explode(toks).alias("__t"))
    # broadcast semi-join FIRST: only query-term instances survive to
    # the aggregations, so the corpus never shuffles its full vocabulary
    inst = inst.join(F.broadcast(qterms.select("__t").distinct()), "__t", "left_semi")

    tf = inst.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        tf.join(F.broadcast(dft), "__t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(corp))
        .join(F.broadcast(qterms), "__t")
    )
    idf = (F.col("__N").cast("double") - F.col("__df") + F.lit(0.5)) / (
        F.col("__df") + F.lit(0.5)
    )
    avgdl = F.col("__sumdl").cast("double") / F.col("__N")
    denom = F.col("__tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / avgdl
    )
    term_score = idf * (F.col("__tf").cast("double") * F.lit(k1 + 1.0)) / denom
    q6 = F.floor(F.lit(1000000.0) * term_score) / F.lit(1000000.0)

    from farmrpg_etl_spark.functions.exact import dec_sum as _dec_sum

    agg = scored.groupBy(query_id_col, id_col).agg(
        F.round(_dec_sum(q6).cast("double"), 6).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    query_col: str,
    id_col: str,
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings — the standard
    hybrid-retrieval combiner (sparse BM25 + dense embedding top-k):
    ``score(d) = Σ_lists 1/(k_rrf + rank_list(d))``, documents absent
    from a list contribute 0 from it. RRF is the production default
    because it needs NO score calibration between the lists — only
    ranks — and a document surfaced by both lists beats one surfaced
    by either alone.

    Cross-engine exactness: each contribution is one integer-argument
    double division, the sum is a fixed two-term chain, and the fused
    ordering breaks ties on the 1e-6-rounded score by id — no
    transcendentals, no accumulation-order hazard.

    Scale shape: inputs are already per-query top-k relations (queries
    × k rows — tiny regardless of corpus size); the fusion is one
    full-outer join on (query, id) plus a WindowGroupLimit top-k. The
    expensive work happened upstream in the two retrievers; fusion
    adds no corpus-sized stage."""
    s = sparse.select(
        F.col(query_col), F.col(id_col), F.col("rank").alias("__rs")
    )
    d = dense.select(
        F.col(query_col), F.col(id_col), F.col("rank").alias("__rd")
    )
    fused = s.join(d, [query_col, id_col], "full_outer").select(
        query_col,
        id_col,
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("__rs")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("__rd")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_col, id_col, "rrf_score", "rank")
    )
