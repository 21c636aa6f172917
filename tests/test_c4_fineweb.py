"""Unit tests for the C4/FineWeb/Gopher heuristic filter bundle
(`operators/quality.c4_fineweb_signals`)."""

from __future__ import annotations

from farmrpg_etl_spark.operators.quality import c4_fineweb_signals

CLEAN = (
    "The quick brown fox jumps over the lazy dog near the river bank today.\n"
    "We walked to the market with a basket full of fresh bread and cheese.\n"
    "That was the best decision that anyone could have made this year.\n"
    "People of all ages came to see the parade and enjoy the music."
)


def _signals(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_fineweb_signals(df).collect()}


def test_clean_doc_keeps_both(spark):
    s = _signals(spark, [(1, CLEAN)])[1]
    assert s["keep_c4"] and s["keep_gopher"]
    assert s["n_lines"] == 4 and s["n_terminal_lines"] == 4
    assert s["terminal_ratio_micros"] == 1_000_000
    assert s["stop_hits"] >= 5  # the, to, of, and, that, have, with
    assert 3_000_000 <= s["mean_wlen_micros"] <= 10_000_000


def test_c4_page_drop_flags(spark):
    s = _signals(
        spark,
        [
            (1, CLEAN + "\nSome Lorem Ipsum placeholder text here."),
            (2, CLEAN + "\nfunction f() { return 0; }"),
            (3, CLEAN.replace("walked", "JavaScript")),
            (4, "Too short.\nReally."),  # < 3 terminal lines
        ],
    )
    assert not s[1]["keep_c4"] and s[1]["has_lorem"]
    assert not s[2]["keep_c4"] and s[2]["has_brace"]
    assert not s[3]["keep_c4"] and s[3]["has_js"]
    assert not s[4]["keep_c4"] and s[4]["n_terminal_lines"] == 2


def test_ellipsis_is_not_terminal(spark):
    s = _signals(spark, [(1, "First line...\nSecond line.")])[1]
    assert s["n_terminal_lines"] == 1
    assert s["ellipsis_ratio_micros"] == 500_000


def test_gopher_rules(spark):
    word_soup = " ".join(["data"] * 60)  # no stopwords, 1 line, no punct
    bullets = "\n".join([f"- item {i}." for i in range(10)]) + "\n" + CLEAN
    s = _signals(spark, [(1, word_soup), (2, bullets)])
    assert not s[1]["keep_gopher"] and s[1]["stop_hits"] == 0
    # 10 bullet lines of 14 total = 71% <= 90% -> bullets alone pass
    assert s[2]["bullet_ratio_micros"] == 714_285
    assert s[2]["keep_gopher"]


def test_gopher_word_count_bounds(spark):
    few = "The fox and the dog have that with be of to."  # 11 words < 50
    s = _signals(spark, [(1, few)])[1]
    assert not s["keep_gopher"] and s["n_words"] == 11
    assert s["stop_hits"] == 8  # every Gopher stop word present


def test_empty_text(spark):
    s = _signals(spark, [(1, "")])[1]
    assert s["n_words"] == 0 and s["mean_wlen_micros"] == 0
    assert not s["keep_c4"] and not s["keep_gopher"]


def test_no_shuffle_in_plan(spark):
    """The bundle must stay one codegen'd scan — no exchange."""
    df = spark.createDataFrame([(1, CLEAN)], "doc_id long, text string")
    plan = c4_fineweb_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
