"""Bigram-LM perplexity filtering (operators/langmodel.py).

Hand-computed smoothing math on a corpus small enough to verify on
paper, plus the empty-document and bucket-cut contracts.
"""

import math

import pytest

from farmrpg_etl_spark.operators import langmodel as LM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b"),
            (3, "c c c"),
            (4, "   "),  # tokenizes to nothing
        ],
        "doc_id long, text string",
    )


def test_bigram_instances_bos_and_empty(docs):
    rows = {
        (r.doc_id, r.prev, r.w)
        for r in LM.bigram_instances(docs, "text", "doc_id").collect()
    }
    # doc 1: (<s>,a) (a,b) (b,a) (a,b); doc 2: (<s>,a) (a,b); doc 3:
    # (<s>,c) (c,c) (c,c); doc 4: nothing.
    assert (1, "<s>", "a") in rows and (1, "b", "a") in rows
    assert (2, "a", "b") in rows
    assert (3, "c", "c") in rows
    assert not any(d == 4 for d, _, _ in rows)


def test_train_bigram_lm_addone_math(docs):
    lm = {
        (r.prev, r.w): (r.c, r.p)
        for r in LM.train_bigram_lm(docs, "text", "doc_id").collect()
    }
    # vocab = {a, b, c} → V = 3.
    # c(a,b)=3, c(a,·)=3 → p = (3+1)/(3+3)
    assert lm[("a", "b")][0] == 3
    assert lm[("a", "b")][1] == pytest.approx(4 / 6)
    # c(<s>,a)=2, c(<s>,·)=3 → p = (2+1)/(3+3)
    assert lm[("<s>", "a")][1] == pytest.approx(3 / 6)
    # c(c,c)=2, c(c,·)=2 → p = (2+1)/(2+3)
    assert lm[("c", "c")][1] == pytest.approx(3 / 5)


def test_doc_nll_matches_hand_sum(docs):
    out = {r.doc_id: (r.n_tok, r.nll) for r in
           LM.doc_nll(docs, "text", "doc_id").collect()}

    def q(p):
        return math.floor(-math.log(p) * 1e6) / 1e6

    # doc 2: (<s>,a) p=3/6, (a,b) p=4/6
    exp2 = round((q(3 / 6) + q(4 / 6)) / 2, 4)
    assert out[2] == (2, exp2)
    # empty doc scores (0, 0.0) rather than disappearing
    assert out[4] == (0, 0.0)


def test_ppl_bucket_filter_cuts_tail(docs):
    all_nll = {r.doc_id: r.nll for r in
               LM.doc_nll(docs, "text", "doc_id").collect()}
    lo = min(v for v in all_nll.values() if v > 0)
    hi = max(all_nll.values())
    kept = LM.ppl_bucket_filter(
        docs, "text", "doc_id", head_nll=lo, tail_nll=(lo + hi) / 2
    ).collect()
    ids = {r.doc_id for r in kept}
    # the max-NLL doc is cut; the min-NLL doc is head
    assert all_nll and max(all_nll, key=all_nll.get) not in ids
    buckets = {r.doc_id: r.bucket for r in kept}
    assert buckets[min((v, k) for k, v in all_nll.items() if v > 0)[1]] == "head"


def test_doc_nll_external_lm_fallback(spark):
    """Frozen-LM scoring (r8 ADVICE): unseen bigrams get the smoothed
    zero-count mass, n_tok counts the document's tokens."""
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "a c d")], "doc_id long, text string")
    lm = LM.train_bigram_lm(train, "text", "doc_id")
    out = {r.doc_id: (r.n_tok, r.nll) for r in
           LM.doc_nll(score, "text", "doc_id", lm=lm).collect()}

    def q(p):
        return math.floor(-math.log(p) * 1e6) / 1e6

    # LM: V=2; (<s>,a) c=1 cp=1 -> p=2/3; (a,b) c=1 cp=1 -> p=2/3.
    # doc 9 pairs: (<s>,a) hit 2/3; (a,c) known context, unseen word
    # -> 1/(cp(a)+V)=1/3; (c,d) unseen context -> 1/V=1/2.
    exp = round((q(2 / 3) + q(1 / 3) + q(1 / 2)) / 3, 4)
    assert out[9] == (3, exp)


def test_doc_nll_external_lm_n_tok_invariant(spark):
    """A fully out-of-vocabulary document must NOT fall through to
    (0, 0.0) / bucket head — it gets full fallback mass (the r8
    correctness inversion)."""
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    gib = spark.createDataFrame([(7, "x y z")], "doc_id long, text string")
    lm = LM.train_bigram_lm(train, "text", "doc_id")
    (row,) = LM.doc_nll(gib, "text", "doc_id", lm=lm).collect()
    assert row.n_tok == 3 and row.nll > 0.0
    # and it buckets tail (cut), not head, under tight thresholds
    kept = LM.ppl_bucket_filter(
        gib, "text", "doc_id", head_nll=0.1, tail_nll=0.2, lm=lm
    ).collect()
    assert kept == []


def test_doc_nll_rejects_bare_lm(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    bad = LM.train_bigram_lm(docs, "text", "doc_id").select("prev", "w", "p")
    with pytest.raises(ValueError, match="train_bigram_lm"):
        LM.doc_nll(docs, "text", "doc_id", lm=bad)


# ------------------------------------------------- Kneser-Ney bigram


def test_train_kn_bigram_lm_hand_math(docs):
    """Hand check on the 4-doc corpus. Bigram types: (<s>,a),(a,b),
    (b,a),(<s>,c),(c,c) -> n_types=5, V=3 (a,b,c).
    For (a,b): c=3, cp('a')=3, n1p('a')=1, cw_cont('b')=1 ->
    p = (3-0.75)/3 + (0.75*1/3)*((1+1)/(5+3)) = 0.75 + 0.0625 = 0.8125.
    """
    lm = {
        (r["prev"], r["w"]): r
        for r in LM.train_kn_bigram_lm(docs, "text", "doc_id").collect()
    }
    assert set(lm) == {
        ("<s>", "a"), ("a", "b"), ("b", "a"), ("<s>", "c"), ("c", "c"),
    }
    r = lm[("a", "b")]
    assert (r["c"], r["cp"], r["n1p"], r["cw_cont"]) == (3, 3, 1, 1)
    assert (r["n_types"], r["V"]) == (5, 3)
    assert r["p"] == 0.8125  # exact dyadic arithmetic
    # discounted mass is redistributed: every p in (0, 1), and a
    # context's total probability over seen words stays < 1 (the
    # remainder is the unseen-word mass)
    assert all(0.0 < v["p"] < 1.0 for v in lm.values())
    assert sum(v["p"] for v in lm.values() if v["prev"] == "a") < 1.0


def test_doc_nll_kn_frozen_fallback_paths(spark):
    """Frozen-LM scoring: seen bigram uses p; seen context + unseen
    word gets lambda(prev)*p_cont(w); unseen context gets p_cont(w).
    All finite, n_tok invariant to LM coverage."""
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c c c")],
        "doc_id long, text string",
    )
    lm = LM.train_kn_bigram_lm(train, "text", "doc_id")
    new = spark.createDataFrame(
        [(10, "a b"), (11, "a zzz"), (12, "qqq rrr")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           LM.doc_nll_kn(new, "text", "doc_id", lm=lm).collect()}
    assert out[10]["n_tok"] == 2 and out[10]["nll"] > 0
    assert out[11]["n_tok"] == 2 and math.isfinite(out[11]["nll"])
    assert out[12]["n_tok"] == 2 and math.isfinite(out[12]["nll"])
    # unseen events must score WORSE (higher NLL) than the seen doc
    assert out[11]["nll"] > out[10]["nll"]
    assert out[12]["nll"] > out[10]["nll"]


def test_doc_nll_kn_rejects_bare_lm(spark):
    lm = spark.createDataFrame([("a", "b", 0.5)], "prev string, w string, p double")
    with pytest.raises(ValueError, match="train_kn_bigram_lm"):
        LM.doc_nll_kn(
            spark.createDataFrame([(1, "a b")], "doc_id long, text string"),
            "text", "doc_id", lm=lm,
        )
