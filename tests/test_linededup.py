"""Line-level exact dedup (operators/linededup.py)."""

import pytest

from farmrpg_etl_spark.operators.linededup import remove_frequent_lines


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\nfooter"),
            (2, "cookie banner\nreal content two\nfooter"),
            (3, "unique document\nonly here"),
            (4, "cookie banner"),
        ],
        "doc_id long, text string",
    )


def test_boilerplate_lines_cut_everywhere(spark, docs):
    out = {r.doc_id: r for r in
           remove_frequent_lines(docs, "text", "doc_id", min_count=2).collect()}
    # 'cookie banner' (x3) and 'footer' (x2) are boilerplate
    assert out[1].text_out == "real content one"
    assert out[2].text_out == "real content two"
    assert out[1].n_lines == 3 and out[1].n_kept == 1


def test_untouched_document_roundtrips(spark, docs):
    out = {r.doc_id: r for r in
           remove_frequent_lines(docs, "text", "doc_id", min_count=2).collect()}
    assert out[3].text_out == "unique document\nonly here"
    assert out[3].n_lines == 2 and out[3].n_kept == 2


def test_fully_boilerplate_doc_survives_empty(spark, docs):
    out = {r.doc_id: r for r in
           remove_frequent_lines(docs, "text", "doc_id", min_count=2).collect()}
    assert out[4].text_out == "" and out[4].n_kept == 0 and out[4].n_lines == 1


def test_min_count_above_max_freq_is_identity(spark, docs):
    out = {r.doc_id: r.text_out for r in
           remove_frequent_lines(docs, "text", "doc_id", min_count=99).collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert out == src


def test_quality_logit_hand_math(spark):
    """Dyadic-weight logit on a hand-computable doc (lives here to
    avoid a new session-scoped module)."""
    from farmrpg_etl_spark.operators.quality import quality_logit

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in quality_logit(df, "text", "doc_id").collect()}
    r = out[1]
    # n_tok=3, no punct, stop hits=1 ('the'), all distinct
    assert r.n_tok == 3 and r.punct_r == 0.0
    assert r.stop_r == round(1 / 3, 6) and r.dist_r == 1.0
    logit = -0.75 + 0.00390625 * 3 + 2.0 * (1 / 3) + 0.75 * 1.0
    import math

    assert r.logit == math.floor(logit * 1e6) / 1e6
    assert r.label == ("keep" if logit >= 0 else "drop")
    # empty doc: all-zero features, bias dominates -> drop
    assert out[2].n_tok == 0 and out[2].label == "drop"
