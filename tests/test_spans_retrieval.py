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
