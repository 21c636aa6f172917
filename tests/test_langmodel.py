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


# ------------------------------------------------------- order-n KN


def test_kn_ngram_order2_reduces_to_bigram_model(spark):
    """The generic order-n construction at order=2 must reproduce
    train_kn_bigram_lm BIT-FOR-BIT (ñ1 = cw_cont, ñ1(·) = n_types) —
    the anchor that pins the recursive construction to the already-
    oracle-verified bigram model."""
    from farmrpg_etl_spark.operators.langmodel import (
        train_kn_bigram_lm,
        train_kn_ngram_lm,
    )
    from farmrpg_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    old = {
        (r["prev"], r["w"]): r["p"]
        for r in train_kn_bigram_lm(docs, "text", "doc_id").collect()
    }
    new = {
        (r["ctx"], r["w"]): r["p"]
        for r in train_kn_ngram_lm(docs, "text", "doc_id", order=2).collect()
    }
    assert old == new  # exact double equality, same keys


def test_kn5_probabilities_sum_to_one_per_context(spark):
    """Interpolated KN is a proper conditional distribution: for any
    observed top-order context, sum over the WHOLE vocabulary of
    p(w|ctx) — seen continuations via the discounted term, unseen via
    the backoff chain — must be 1 (the mass-conservation identity
    Σ(nn−D)/den = 1 − λ at every level)."""
    from farmrpg_etl_spark.operators.langmodel import (
        _kn_attach_p,
        kn_ngram_tables,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "a dog sat on a mat"),
            (4, "the dog ran to the mat"),
        ],
        "doc_id long, text string",
    )
    tables = kn_ngram_tables(docs, "text", "doc_id", order=5)
    vocab = [r["w"] for r in tables["t"][1].select("w").collect()]
    ctxs = [
        r["ctx"] for r in tables["top"].select("ctx").distinct().limit(5).collect()
    ]
    pairs = spark.createDataFrame(
        [(c, w) for c in ctxs for w in vocab], "ctx string, w string"
    )
    sums = (
        _kn_attach_p(pairs, tables)
        .groupBy("ctx")
        .agg(F.sum("p").alias("s"))
        .collect()
    )
    assert len(sums) == len(ctxs)
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9, (r["ctx"], r["s"])


def test_kn5_frozen_model_scores_novel_text_finitely(spark):
    """The CCNet regime: a model frozen on one batch scores a later
    batch containing unseen words and unseen contexts — every token
    gets finite positive mass through the backoff chain, and n_tok
    counts the document's own tokens regardless of coverage."""
    import math

    from farmrpg_etl_spark.operators.langmodel import (
        doc_nll_kn_ngram,
        kn_ngram_tables,
    )

    train = spark.createDataFrame(
        [(1, "spark shuffles data between stages"),
         (2, "spark broadcasts small tables")],
        "doc_id long, text string",
    )
    tables = kn_ngram_tables(train, "text", "doc_id", order=5)
    novel = spark.createDataFrame(
        [(10, "zyx qwv entirely novel words"),     # all-unseen
         (11, "spark shuffles zyx data"),          # mixed
         (12, "")],                                # empty
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in doc_nll_kn_ngram(
            novel, "text", "doc_id", order=5, tables=tables
        ).collect()
    }
    assert out[10]["n_tok"] == 5 and out[11]["n_tok"] == 4
    for d in (10, 11):
        assert math.isfinite(out[d]["nll"]) and out[d]["nll"] > 0
    assert out[12]["n_tok"] == 0 and out[12]["nll"] == 0.0
    # unseen mass is smaller than seen mass: all-novel doc scores worse
    assert out[10]["nll"] > out[11]["nll"]


def test_kn5_short_docs_fully_padded(spark):
    """Documents shorter than the order still contribute every token
    (BOS padding), and a 1-token doc's context is pure sentinel."""
    from farmrpg_etl_spark.operators.langmodel import ngram_instances

    docs = spark.createDataFrame(
        [(1, "hi"), (2, "a b")], "doc_id long, text string"
    )
    inst = {
        (r["doc_id"], r["ctx"], r["w"])
        for r in ngram_instances(docs, "text", "doc_id", 5).collect()
    }
    assert inst == {
        (1, "<s> <s> <s> <s>", "hi"),
        (2, "<s> <s> <s> <s>", "a"),
        (2, "<s> <s> <s> a", "b"),
    }


def test_kn5_bucket_filter_cuts_tail(spark):
    """ppl_bucket_filter_kn keeps head/middle and CUTS the tail; the
    bucket boundary is the nll value itself."""
    from farmrpg_etl_spark.operators.langmodel import (
        doc_nll_kn_ngram,
        ppl_bucket_filter_kn,
    )
    from farmrpg_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    nll = {
        r["doc_id"]: r["nll"]
        for r in doc_nll_kn_ngram(docs, "text", "doc_id", order=5).collect()
    }
    out = {
        r["doc_id"]: r["bucket"]
        for r in ppl_bucket_filter_kn(
            docs, "text", "doc_id", head_nll=1.02, tail_nll=1.13, order=5
        ).collect()
    }
    assert set(out) == {d for d, v in nll.items() if v <= 1.13}
    for d, b in out.items():
        assert b == ("head" if nll[d] <= 1.02 else "middle")
    assert any(v > 1.13 for v in nll.values())  # the cut is non-vacuous


def test_kn_tables_release_cleanly(spark, docs):
    """r13 verdict #5: two sequential trainings followed by
    unpersist_kn_tables leave NO accumulated cached relations —
    the N-models regime (one LM per language) must not leak
    LM-sized caches across trainings."""
    def _ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in jmap.keySet().toArray()}

    before = _ids()
    t1 = LM.kn_ngram_tables(docs, "text", "doc_id", order=3)
    t1["top"].count()
    t2 = LM.kn_ngram_tables(docs, "text", "doc_id", order=3)
    t2["top"].count()
    assert _ids() - before  # trainings did cache
    LM.unpersist_kn_tables(t1)
    LM.unpersist_kn_tables(t2)
    assert _ids() - before == set()  # ...and released every handle


def test_kn_query_rows_release_tables(spark):
    """The batch KN query rows materialize their result and release
    every LM count relation before returning — only the one
    (bounded) result cache may remain."""
    from farmrpg_etl_spark.queries import kn5_ppl_filter_docs

    def _ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in jmap.keySet().toArray()}

    # compare ID SETS, not sizes: the ContextCleaner may drop OTHER
    # tests' abandoned caches asynchronously mid-test, shrinking a
    # size-based count under us
    before = _ids()
    out = kn5_ppl_filter_docs(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    added = _ids() - before
    assert len(added) == 1  # the materialized result, nothing else
    out.unpersist()


def test_per_lang_keyed_training_equals_separate_models(spark):
    """The per-language CCNet invariant: training N models in ONE
    keyed corpus pass (key_cols=("lang",)) scores every document
    EXACTLY as training each language's model separately on its own
    subcorpus — same counts, same interpolation, same IEEE doubles.
    Both languages share surface tokens so a cross-language count
    bleed would change the numbers."""
    rows = [
        (1, "aa", "the cat sat on the mat"),
        (2, "aa", "the cat sat on the hat"),
        (3, "aa", "a cat ran to the mat"),
        (4, "bb", "the cat sat on the rug"),
        (5, "bb", "the dog sat on the rug"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    tables = LM.kn_ngram_tables(
        docs, "text", "doc_id", order=3, key_cols=("lang",)
    )
    keyed = {
        r["doc_id"]: (r["lang"], r["n_tok"], r["nll"])
        for r in LM.doc_nll_kn_ngram(
            docs, "text", "doc_id", order=3, tables=tables,
            key_cols=("lang",),
        ).collect()
    }
    LM.unpersist_kn_tables(tables)
    assert set(keyed) == {1, 2, 3, 4, 5}
    for lang in ("aa", "bb"):
        sub = docs.filter(docs.lang == lang)
        solo = {
            r["doc_id"]: (r["n_tok"], r["nll"])
            for r in LM.doc_nll_kn_ngram(
                sub, "text", "doc_id", order=3
            ).collect()
        }
        for did, (n_tok, nll) in solo.items():
            klang, kn_tok, knll = keyed[did]
            assert klang == lang
            assert kn_tok == n_tok
            assert knll == nll, (did, knll, nll)  # exact doubles


def test_ccnet_per_lang_filter_whitelist_and_thresholds(spark):
    """ccnet_per_lang_filter: per-language thresholds decide the
    bucket (the same nll can be head in one language and tail in
    another), the tail is cut, and a language with no calibrated
    thresholds row is cut entirely (the inner join IS CCNet's
    language whitelist)."""
    rows = [
        (1, "aa", "x y x y x y"),
        (2, "aa", "x z q w p r"),
        (3, "bb", "x y x y x y"),
        (4, "cc", "x y x y x y"),  # no thresholds row -> cut
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    thr = spark.createDataFrame(
        [("aa", 0.7, 1.6), ("bb", 0.1, 0.2)],
        "lang string, head_nll double, tail_nll double",
    )
    out = {
        r["doc_id"]: (r["lang"], r["bucket"], r["nll"])
        for r in LM.ccnet_per_lang_filter(
            docs, "text", "doc_id", "lang", thr, order=3
        ).collect()
    }
    # exact membership pinned (r14 review: conditional asserts could
    # pass vacuously if a regression cut docs 2/3 entirely)
    assert set(out) == {1, 2, 3}  # cc (doc 4) cut by the whitelist
    assert out[1][0] == "aa"
    # the SAME text is head under aa's loose thresholds (doc 1,
    # nll 0.319 <= 0.7) but only middle under bb's tight ones (doc 3,
    # nll 0.1425 > 0.1): per-language thresholds decide the bucket
    assert out[1][1] == "head"
    assert out[3] == ("bb", "middle", 0.1425)
    assert out[3][2] <= 0.2  # within bb's tail, so kept
    # aa's two docs: repetitive doc 1 scores lower than the
    # all-singletons doc 2 under aa's model, landing in middle
    assert out[2][1] == "middle"
    assert out[1][2] < out[2][2]


def test_ccnet_per_lang_filter_requires_df_or_nll(spark):
    """df=None with the default nll=None is an argument error, not an
    opaque AttributeError deep in kn_ngram_tables (ADVICE r16 —
    mirrors dsir_scored's guard)."""
    import pytest

    with pytest.raises(ValueError, match="pass df"):
        LM.ccnet_per_lang_filter(None, "text", "doc_id", "lang")


def test_keyed_tables_reject_mismatched_key_cols(spark):
    """An explicit key_cols that disagrees with the tables' keys
    fails loudly (like the order check) instead of being silently
    overridden by the tables."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "aa", "x y z"), (2, "bb", "x y w")],
        "doc_id long, lang string, text string",
    )
    tables = LM.kn_ngram_tables(
        docs, "text", "doc_id", order=2, key_cols=("lang",)
    )
    with pytest.raises(ValueError, match="keyed by"):
        LM.doc_nll_kn_ngram(
            docs, "text", "doc_id", order=2, tables=tables,
            key_cols=("source",),
        )
    with pytest.raises(ValueError, match="keyed by"):
        LM.train_kn_ngram_lm(
            docs, "text", "doc_id", order=2, tables=tables,
            key_cols=("source",),
        )
    # inherit path (key_cols=()) still works
    assert LM.doc_nll_kn_ngram(
        docs, "text", "doc_id", order=2, tables=tables,
        key_cols=("lang",),
    ).count() == 2
    LM.unpersist_kn_tables(tables)
