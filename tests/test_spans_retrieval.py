"""Unit tests for duplicated-span detection (ExactSubstr) and BM25
top-k retrieval."""

from pyspark.sql import functions as F

from farmrpg_etl_spark.operators import dedup
from farmrpg_etl_spark.operators.retrieval import bm25_topk


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_duplicated_spans_shared_gram(spark):
    # "a b c" appears in docs 1 and 2 -> each covers 3 tokens
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c z"),
            (3, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    out = _rows(dedup.duplicated_spans(df, "text", "doc_id", k=3))
    assert out[1]["dup_tok"] == 3 and out[1]["n_tok"] == 6
    assert out[2]["dup_tok"] == 3
    assert out[3]["dup_tok"] == 0 and out[3]["dup_ratio"] == 0.0


def test_duplicated_spans_overlapping_interval_union(spark):
    # exact duplicate docs: every gram duplicated; overlapping grams
    # must union to the doc length, not double-count
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")],
        "doc_id long, text string",
    )
    out = _rows(dedup.duplicated_spans(df, "text", "doc_id", k=3))
    # grams at pos 0 and 1, union covers all 4 tokens
    assert out[1]["dup_tok"] == 4
    assert out[1]["dup_ratio"] == 1.0
    assert out[2]["dup_tok"] == 4


def test_duplicated_spans_within_doc_repeat_counts(spark):
    # the SAME doc repeating a gram twice reaches min_count on its own
    df = spark.createDataFrame(
        [(1, "a b c x x a b c"), (2, "q r s t u v w z")],
        "doc_id long, text string",
    )
    out = _rows(dedup.duplicated_spans(df, "text", "doc_id", k=3))
    # positions 0..2 and 5..7 covered -> 6 of 8
    assert out[1]["dup_tok"] == 6
    assert out[2]["dup_tok"] == 0


def test_duplicated_spans_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = _rows(dedup.duplicated_spans(df, "text", "doc_id", k=3))
    # shorter than k: no strict grams, never counted
    assert out[1]["dup_tok"] == 0 and out[1]["n_tok"] == 2
    assert out[3]["dup_tok"] == 0 and out[3]["n_tok"] == 0
    assert out[4]["dup_tok"] == 0 and out[4]["dup_ratio"] == 0.0
    assert len(out) == 4


def test_bm25_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [
            (1, "zebra apple apple apple"),
            (2, "apple apple apple apple"),
            (3, "apple banana cherry date"),
            (4, "zebra zebra other words"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(100, "zebra apple")], "query_id long, query_text string"
    )
    out = bm25_topk(docs, q, "text", "doc_id", k=4)
    ranked = [r["doc_id"] for r in out.orderBy("rank").collect()]
    # docs containing the rare term 'zebra' outrank apple-only docs
    assert set(ranked[:2]) == {1, 4}
    assert out.count() == 4
    ranks = [r["rank"] for r in out.orderBy("rank").collect()]
    assert ranks == [1, 2, 3, 4]


def test_bm25_k_cap_and_no_match(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} filler") for i in range(10)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "filler"), (2, "absentterm")],
        "query_id long, query_text string",
    )
    out = bm25_topk(docs, q, "text", "doc_id", k=3)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_q.get(1) == 3  # capped at k
    assert 2 not in per_q  # no scored docs -> no rows


def test_cut_duplicated_spans_basic(spark):
    # "a b c" duplicated across docs 1/2 -> those 3 tokens cut from both
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c z"),
            (3, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    out = _rows(dedup.cut_duplicated_spans(df, "text", "doc_id", k=3))
    assert out[1]["text_cut"] == "d e f" and out[1]["kept_tok"] == 3
    assert out[2]["text_cut"] == "x y z"
    assert out[3]["text_cut"] == "p q r s t u" and out[3]["kept_tok"] == 6


def test_cut_duplicated_spans_full_cover_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "")],
        "doc_id long, text string",
    )
    out = _rows(dedup.cut_duplicated_spans(df, "text", "doc_id", k=3))
    assert out[1]["text_cut"] == "" and out[1]["kept_tok"] == 0
    assert out[2]["text_cut"] == ""
    assert out[3]["text_cut"] == "" and out[3]["n_tok"] == 0


def test_cut_agrees_with_detection_counts(spark):
    """kept_tok + duplicated_spans.dup_tok == n_tok on any corpus (the
    cut removes exactly the measured coverage)."""
    docs = [
        (i, " ".join(f"d{i}w{j}" for j in range(12)) + " common phrase tokens here okay")
        for i in range(6)
    ] + [(100, "common phrase tokens here okay " * 3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cut = _rows(dedup.cut_duplicated_spans(df, "text", "doc_id", k=4))
    det = _rows(dedup.duplicated_spans(df, "text", "doc_id", k=4))
    for i in cut:
        assert cut[i]["kept_tok"] + det[i]["dup_tok"] == det[i]["n_tok"], i


def test_cut_idempotent_on_unique_remainder(spark):
    """Fixpoint property: when post-cut token streams are globally
    unique (per-doc unique filler around planted shared spans), a
    second cut changes nothing."""
    span = "the quick brown fox jumps over"
    docs = [
        (i, f"u{i}a u{i}b u{i}c {span} u{i}d u{i}e u{i}f") for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = dedup.cut_duplicated_spans(df, "text", "doc_id", k=3)
    again = dedup.cut_duplicated_spans(
        once.select(F.col("doc_id"), F.col("text_cut").alias("text")),
        "text", "doc_id", k=3,
    )
    r1 = {r["doc_id"]: r["text_cut"] for r in once.collect()}
    r2 = {r["doc_id"]: r["text_cut"] for r in again.collect()}
    assert r1 == r2
    assert all("u0a" in r1[0] for _ in [0])  # filler survives
    assert span.split()[0] not in r1[0]      # planted span cut


def test_cut_not_idempotent_adversarial(spark):
    """Documented non-fixpoint: cutting can make two docs' remainders
    newly share a k-gram, so a second pass removes more (Lee et al.
    iterate to convergence; one pass is the standard operator)."""
    # docs 1/2 share a 2-token prefix/suffix (shorter than k, so no
    # duplicated gram pre-cut) around distinct duplicated middles
    # (each middle also appears in a partner doc 3/4)
    p, s = "p1 p2", "s1 s2"
    df = spark.createDataFrame(
        [
            (1, f"{p} m1 m2 m3 {s}"),
            (2, f"{p} n1 n2 n3 {s}"),
            (3, "q1 m1 m2 m3 q2"),
            (4, "q3 n1 n2 n3 q4"),
        ],
        "doc_id long, text string",
    )
    once = dedup.cut_duplicated_spans(df, "text", "doc_id", k=3)
    r1 = {r["doc_id"]: r["text_cut"] for r in once.collect()}
    # after the cut docs 1/2 both read "p1 p2 s1 s2" -> second pass
    # finds newly-adjacent duplicated grams
    assert r1[1] == r1[2] == "p1 p2 s1 s2"
    again = dedup.cut_duplicated_spans(
        once.select(F.col("doc_id"), F.col("text_cut").alias("text")),
        "text", "doc_id", k=3,
    )
    r2 = {r["doc_id"]: r["text_cut"] for r in again.collect()}
    assert r2[1] == "" and r2[2] == ""  # second pass cuts the new dups


def test_rrf_fuse_semantics(spark):
    """RRF: a doc in BOTH lists outranks a doc in either alone at
    comparable ranks; absent lists contribute exactly 0; ties on the
    rounded score break by id."""
    from farmrpg_etl_spark.operators.retrieval import rrf_fuse

    sparse = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    rows = {r["doc_id"]: r for r in
            rrf_fuse(sparse, dense, "query_id", "doc_id", k_rrf=60, k=10).collect()}
    # 11 in both: 1/62 + 1/61 beats 10's 1/61 alone
    assert rows[11]["rank"] == 1 and rows[10]["rank"] == 2
    assert rows[13]["rrf_score"] == round(1 / 62, 6)   # dense-only
    assert rows[12]["rrf_score"] == round(1 / 63, 6)   # sparse-only
    assert rows[11]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert set(rows) == {10, 11, 12, 13}
