"""Corpus-quality operators: decontamination, repetition signals, and
the hierarchical time rollup."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.hashing import word_ngrams
from farmrpg_etl_spark.operators import quality, rollup


def test_word_ngrams_strict(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), (None,)], ["text"]
    )
    out = df.select(word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert out[0].g == ["a b c", "b c d"]
    assert out[1].g == []  # shorter than n: no partial grams
    assert out[2].g == []
    assert out[3].g == []


def test_ngram_contamination_counts(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares "the quick brown"
            (2, "totally unrelated words here"),
            (3, "the quick brown fox sleeps the quick brown fox sleeps"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.n_contaminated_ngrams
        for r in quality.ngram_contamination(train, ev, n=3).collect()
    }
    # doc 1 shares 3 distinct 3-grams, doc 3 shares 2 ("fox jumps" differs),
    # doc 2 shares none (absent from the output, not zero).
    assert got == {1: 3, 3: 2}


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame([(1, "a a b"), (2, "x y")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in quality.repetition_metrics(df).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 3
    assert abs(r1.dup_word_frac - 0.333333) < 1e-9  # (3-2)/3 floored
    assert r1.dup_2gram_frac == 0.0  # "a a", "a b" both unique
    assert r1.top_2gram == "a b"  # tie on count → lexicographically greatest
    assert abs(r1.top_2gram_char_frac - 0.6) < 1e-9  # 1*3 chars / 5 chars
    r2 = rows[2]
    assert r2.dup_word_frac == 0.0 and r2.top_2gram == "x y"


def test_repetition_metrics_highly_repetitive_doc_scores_worse(spark):
    df = spark.createDataFrame(
        [(1, "spam " * 50), (2, " ".join(f"w{i}" for i in range(50)))],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in quality.repetition_metrics(df).collect()}
    assert rows[1].dup_word_frac > 0.9 > rows[2].dup_word_frac == 0.0
    assert rows[1].dup_2gram_frac > 0.9 > rows[2].dup_2gram_frac == 0.0


def test_hierarchical_rollup_equals_direct(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (t0 + datetime.timedelta(minutes=m, seconds=s), "click", float(m) + 0.25)
        for m in range(0, 130, 7)
        for s in (0, 30)
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    got = rollup.hierarchical_time_rollup(df, "ts", ["event_type"], "value")
    direct = df.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


# ------------------------------------------ two-pass heavy hitters
def test_heavy_hitters_exact_and_partitioning_independent(spark):
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.heavyhitters import heavy_hitters

    # 'hot' 40%, 'warm' 25%, tail of singletons
    rows = [("hot",)] * 400 + [("warm",)] * 250 + [(f"t{i}",) for i in range(350)]
    df = spark.createDataFrame(rows, "item string")
    want = {("hot", 400), ("warm", 250)}  # > 1000/10 = 100
    for parts in (1, 3, 17):
        got = {
            (r["item"], r["n_occurrences"])
            for r in heavy_hitters(df.repartition(parts), "item", k=10).collect()
        }
        assert got == want, parts


def test_heavy_hitters_threshold_is_strict(spark):
    from farmrpg_etl_spark.operators.heavyhitters import heavy_hitters

    # item at exactly n/k occurrences must NOT be emitted (> is strict)
    rows = [("x",)] * 10 + [(f"t{i}",) for i in range(90)]  # n=100, k=10 → >10
    df = spark.createDataFrame(rows, "item string")
    assert heavy_hitters(df, "item", k=10).count() == 0
    rows.append(("x",))  # 11 > 10: now a heavy hitter
    df = spark.createDataFrame(rows, "item string")
    got = heavy_hitters(df, "item", k=10).collect()
    assert [(r["item"], r["n_occurrences"]) for r in got] == [("x", 11)]


class TestBloomPruneContamination:
    def test_exact_column_matches_unpruned_and_no_false_negatives(self, spark):
        from farmrpg_etl_spark.operators.quality import (
            bloom_prune_contamination,
            ngram_contamination,
        )

        base = "one two three four five six seven eight nine ten eleven twelve thirteen"
        rows = [
            (1, base + " shared tail of the corpus document body"),
            (2, base + " entirely different continuation text here now"),
            (3, "no overlap with anything at all in this one "
                "padded out to reach thirteen tokens total yes"),
        ]
        evr = [(100, base + " shared tail of the corpus document body")]
        train = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame(evr, "doc_id long, text string")
        pruned = {r.doc_id: r for r in
                  bloom_prune_contamination(train, ev, n=13).collect()}
        exact = {r.doc_id: r.n_contaminated_ngrams for r in
                 ngram_contamination(train, ev, n=13).collect()}
        # every exactly-contaminated doc appears with the same exact
        # count (Bloom has no false negatives)
        for doc, n in exact.items():
            assert pruned[doc].n_contaminated_ngrams == n
        # candidates always >= exact matches (false positives only)
        for r in pruned.values():
            assert r.n_cand_grams >= r.n_contaminated_ngrams


class TestBloomBitmapPruneContamination:
    def test_bitmap_form_identical_to_position_form(self, spark):
        from farmrpg_etl_spark.operators.quality import (
            bloom_bitmap_prune_contamination,
            bloom_prune_contamination,
        )

        base = "one two three four five six seven eight nine ten eleven twelve thirteen"
        rows = [
            (1, base + " shared tail of the corpus document body"),
            (2, base + " entirely different continuation text here now"),
            (3, "no overlap with anything at all in this one "
                "padded out to reach thirteen tokens total yes"),
        ]
        evr = [(100, base + " shared tail of the corpus document body")]
        train = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame(evr, "doc_id long, text string")
        pos = sorted(map(tuple, bloom_prune_contamination(train, ev, n=13).collect()))
        bmp = sorted(map(tuple, bloom_bitmap_prune_contamination(train, ev, n=13).collect()))
        # membership in the same bit-position set → row-identical output
        assert bmp == pos

    def test_probe_plan_has_no_join_before_exact_verify(self, spark):
        from farmrpg_etl_spark.operators.quality import (
            bloom_bitmap_prune_contamination,
        )

        train = spark.createDataFrame(
            [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(2, "a b c d e f g h i j k l m n")], "doc_id long, text string"
        )
        out = bloom_bitmap_prune_contamination(train, ev, n=13)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # exactly ONE join in the whole plan: the exact verification of
        # probe survivors. The probe itself is a literal-array filter.
        assert plan.count("Join") == 1, plan


class TestCharEntropy:
    def test_hand_computed_entropy(self, spark):
        from math import floor, log

        from farmrpg_etl_spark.operators.quality import char_entropy

        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "ab"), (3, "")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in char_entropy(df, "text", "doc_id").collect()}
        # uniform single char: entropy 0 (p=1, -1*ln(1)=0)
        assert out[1].n_chars == 4 and out[1].entropy_micros == 0
        # two distinct chars: H = ln 2, via two quantized 0.5*ln2 terms
        qm = floor(-(0.5 * log(0.5)) * 1e6)
        assert out[2].entropy_micros == 2 * qm
        # empty doc: (0, 0), not dropped
        assert out[3].n_chars == 0 and out[3].entropy_micros == 0


def test_temperature_mixture_damps_large_sources(spark):
    """alpha=3/4 damping: the weight RATIO between a big and a small
    source is strictly smaller than their token ratio; weights sum to
    ~1; quotas are integer and conserve <= budget."""
    from farmrpg_etl_spark.operators.quality import (
        temperature_mixture_weights,
    )

    rows = []
    for i in range(1600):  # src_big: 1600 docs x 4 tokens
        rows.append((i, "src_big", "a b c d"))
    for i in range(100):  # src_small: 100 docs x 4 tokens
        rows.append((10_000 + i, "src_small", "a b c d"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in temperature_mixture_weights(
            df, "text", "source", token_budget=1_000_000
        ).collect()
    }
    big, small = out["src_big"], out["src_small"]
    assert big["n_tokens"] == 6400 and small["n_tokens"] == 400
    tok_ratio = big["n_tokens"] / small["n_tokens"]  # 16
    w_ratio = big["weight"] / small["weight"]
    assert w_ratio < tok_ratio  # damped
    assert abs(w_ratio - 8.0) < 0.01  # 16^(3/4) = 8
    assert abs(big["weight"] + small["weight"] - 1.0) < 1e-5
    assert big["token_quota"] + small["token_quota"] <= 1_000_000
    assert isinstance(big["token_quota"], int)


def test_mixture_quota_exact_at_trillion_token_scale(spark):
    """The quota arithmetic must be EXACT at the module's claimed
    100 TB scale (r12 advice #2): with per-source counts ~1e12 the
    old BIGINT product (budget * __m ~ 1e27) overflows 2^63 — the
    DECIMAL(38,0) form must instead reproduce Python's unbounded-int
    floor(budget*m/t) bit-for-bit."""
    from math import floor, sqrt

    from farmrpg_etl_spark.operators.quality import (
        mixture_weights_from_counts,
    )

    counts = {
        "web": 2_500_000_000_000,
        "code": 1_000_000_000_000,
        "books": 400_000_000_000,
    }
    budget = 1_000_000_000_000  # 1T-token training mix
    per_src = spark.createDataFrame(
        list(counts.items()), "source string, n_tokens long"
    )
    out = {
        r["source"]: r["token_quota"]
        for r in mixture_weights_from_counts(
            per_src, "source", budget
        ).collect()
    }
    # same IEEE ops as the Spark expression: sqrt(n*sqrt(n)) then
    # floor-to-micros, then exact integer floor division
    m = {s: floor(sqrt(n * sqrt(n)) * 1e6) for s, n in counts.items()}
    t = sum(m.values())
    expected = {s: budget * mi // t for s, mi in m.items()}
    assert out == expected
    assert sum(out.values()) <= budget  # floor conserves the budget


def _unimax_reference(counts, budget, max_epochs):
    """Independent pure-int water-filling: iterate — cap any source
    whose proportional share of the remaining budget exceeds
    max_epochs · n, remove it, redistribute — until fixpoint. The
    operator solves this in closed form; this oracle solves it by
    brute iteration, so agreement pins the closed form."""
    from math import floor, sqrt

    m = {s: floor(sqrt(n * sqrt(n)) * 1e6) for s, n in counts.items()}
    capped, quotas = set(), {}
    while True:
        b_rem = budget - sum(max_epochs * counts[s] for s in capped)
        m_rem = sum(mi for s, mi in m.items() if s not in capped)
        newly = {
            s
            for s in counts
            if s not in capped
            and b_rem * m[s] >= max_epochs * counts[s] * m_rem
        }
        if not newly:
            break
        capped |= newly
    b_rem = budget - sum(max_epochs * counts[s] for s in capped)
    m_rem = sum(mi for s, mi in m.items() if s not in capped)
    for s, n in counts.items():
        if s in capped:
            quotas[s] = max_epochs * n
        else:
            quotas[s] = b_rem * m[s] // m_rem
    return capped, quotas


def test_unimax_epoch_cap_exact_at_trillion_token_scale(spark):
    """The closed-form water-filling (unimax_mixture_weights) agrees
    with an independent iterative reference at CLAIMED corpus scale
    (1e11–1.6e13 tokens per source) — quotas exact to the integer,
    capped set identical, Σ quota ≤ budget, and every product would
    overflow BIGINT if the DECIMAL(38,0) discipline slipped."""
    from farmrpg_etl_spark.operators.quality import unimax_mixture_weights

    counts = {
        "tail": 100_000_000_000,
        "web": 16_000_000_000_000,
        "code": 4_000_000_000_000,
        "books": 1_000_000_000_000,
    }
    per_src = spark.createDataFrame(
        list(counts.items()), "source string, n_tokens long"
    )
    total = sum(counts.values())
    for ratio, max_epochs in ((1, 2), (3, 2), (3, 4), (2, 2)):
        budget = ratio * total
        rows = unimax_mixture_weights(
            per_src, "source", budget_ratio=ratio, max_epochs=max_epochs
        ).collect()
        got_capped = {r["source"] for r in rows if r["capped"]}
        got_quota = {r["source"]: r["token_quota"] for r in rows}
        exp_capped, exp_quota = _unimax_reference(counts, budget, max_epochs)
        assert got_capped == exp_capped, (ratio, max_epochs)
        assert got_quota == exp_quota, (ratio, max_epochs)
        assert sum(got_quota.values()) <= budget
        for r in rows:  # the cap is a hard invariant, never exceeded
            assert r["token_quota"] <= max_epochs * counts[r["source"]]


def test_unimax_absolute_budget_and_arg_validation(spark):
    """token_budget (absolute) path matches the reference too, and
    passing both/neither budget forms fails loudly."""
    import pytest

    from farmrpg_etl_spark.operators.quality import unimax_mixture_weights

    counts = {"a": 1000, "b": 8000}
    per_src = spark.createDataFrame(
        list(counts.items()), "source string, n_tokens long"
    )
    rows = unimax_mixture_weights(
        per_src, "source", token_budget=12_000, max_epochs=2
    ).collect()
    exp_capped, exp_quota = _unimax_reference(counts, 12_000, 2)
    assert {r["source"]: r["token_quota"] for r in rows} == exp_quota
    assert {r["source"] for r in rows if r["capped"]} == exp_capped
    with pytest.raises(ValueError):
        unimax_mixture_weights(per_src, "source")
    with pytest.raises(ValueError):
        unimax_mixture_weights(
            per_src, "source", token_budget=1, budget_ratio=1
        )
    # a float ratio must raise, not silently floor (2.5 -> 2 would
    # shrink the budget by half a corpus pass without any signal)
    with pytest.raises(TypeError):
        unimax_mixture_weights(per_src, "source", budget_ratio=2.5)


def test_dsir_prefers_target_like_documents(spark):
    """DSIR's importance logit must rank documents that share the
    target's n-gram distribution above documents that don't: raw docs
    written in the target's vocabulary get positive log w, alien-
    vocabulary docs negative, and top-k selection is deterministic
    (md5 Gumbel keys — same result on every run)."""
    from farmrpg_etl_spark.operators.quality import dsir_select

    target = spark.createDataFrame(
        [(1000 + i, "the quick brown fox jumps over the lazy dog")
         for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "the quick brown fox naps under the lazy dog"),
         (2, "zzz qqq www eee rrr ttt yyy uuu iii ooo"),
         (3, "the lazy dog and the quick fox"),
         (4, "aaa bbb ccc ddd eee fff ggg hhh")],
        "doc_id long, text string",
    )
    out = dsir_select(raw, target, "text", "doc_id", n_buckets=256, k=2)
    rows = {r["doc_id"]: r["logw"] for r in out.collect()}
    # the two target-like docs are selected; alien docs lose
    assert set(rows) == {1, 3}
    assert all(v > 0 for v in rows.values())
    again = {
        r["doc_id"]: (r["logw"], r["gkey"])
        for r in dsir_select(
            raw, target, "text", "doc_id", n_buckets=256, k=2
        ).collect()
    }
    assert set(again) == {1, 3}  # deterministic resample


def test_corpus_report_is_exact_on_a_tiny_corpus(spark, tmp_path):
    """The one-row report card's integers must match a hand recount:
    duplicate fingerprints collapse into n_dup_docs, the modal
    language and its count are right, the contamination census sees
    the planted 13-gram overlap, and the quality mass is the sum of
    per-doc micro-quantized scores."""
    from farmrpg_etl_spark.functions import text as T
    from farmrpg_etl_spark.queries import corpus_report_docs
    import pyspark.sql.functions as F

    shared = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        (0, shared, "s0"),                      # doc 0: holdout (0 % 101 == 0)
        (1, "alpha beta gamma", "s0"),
        (2, "alpha  beta   gamma", "s0"),       # same fp as doc 1
        (3, shared + " extra tail", "s0"),      # contaminated vs holdout
        (4, "delta epsilon zeta", "s0"),
    ]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(str(d))
    out = corpus_report_docs(spark, str(tmp_path)).collect()[0]
    assert out["n_docs"] == 5
    assert out["n_dup_docs"] == 1          # docs 1 and 2 share a fp
    assert out["n_contaminated_docs"] == 1  # doc 3 only
    m = T.text_metrics(
        spark.read.parquet(str(d)), "text"
    ).select(
        F.round(F.col("quality") * 1000000.0).cast("long").alias("qm"),
        "n_tokens", "lang_pred",
    ).collect()
    assert out["sum_quality_micros"] == sum(r["qm"] for r in m)
    assert out["n_tokens"] == sum(r["n_tokens"] for r in m)
    langs = {}
    for r in m:
        langs[r["lang_pred"]] = langs.get(r["lang_pred"], 0) + 1
    assert out["n_langs"] == len(langs)
    best = max(langs.items(), key=lambda kv: (kv[1], kv[0]))
    assert (out["top_lang"], out["top_lang_n"]) == (best[0], best[1])


def test_unimax_survives_1700_ten_trillion_token_sources(spark):
    """The micro-score SUM passes 2^63 at ~1,700 ten-trillion-token
    sources (Σ m ≈ 1.1e19) — the window sums must run in
    DECIMAL(38,0) like the products, or ANSI mode kills the job in
    exactly the domain the operator claims (r14 review finding)."""
    from farmrpg_etl_spark.operators.quality import unimax_mixture_weights

    n = 10_000_000_000_000  # 10T tokens each
    per = spark.createDataFrame(
        [(f"s{i:04d}", n + i) for i in range(1700)],
        "source string, n_tokens long",
    )
    rows = unimax_mixture_weights(
        per, "source", budget_ratio=2, max_epochs=2
    ).collect()
    assert len(rows) == 1700
    budget = 2 * sum(n + i for i in range(1700))
    total = sum(r["token_quota"] for r in rows)
    assert 0 < total <= budget
    for r in rows:  # caps hold everywhere
        assert r["token_quota"] <= 2 * (n + int(r["source"][1:]))


def test_unimax_assemble_epoch_fill_semantics(spark):
    """The materialized UniMax schedule honors its quota contract
    exactly: a capped source (quota = max_epochs·N) gives EVERY doc
    exactly max_epochs copies; an uncapped source fills whole epochs
    plus a deterministic prefix with Σ n_copies·n_tok ≤ quota and
    > quota − N (the next doc would overflow); output is identical
    across runs."""
    from farmrpg_etl_spark.operators.quality import (
        unimax_assemble,
        unimax_mixture_weights,
    )

    rows = []
    # "small": few tokens -> over-samples under alpha=3/4 -> capped
    for i in range(5):
        rows.append((i, "small", "a b c"))
    # "big": dominates the corpus -> uncapped
    for i in range(40):
        rows.append((100 + i, "big", "w x y z " * 25))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    # budget_ratio=1 (not 2): with ratio == max_epochs and one other
    # source capped, the big source's share exactly saturates its own
    # cap and everything caps — ratio 1 keeps it genuinely uncapped
    out = unimax_assemble(
        df, "text", "doc_id", "source", budget_ratio=1, max_epochs=2
    ).collect()
    out2 = unimax_assemble(
        df, "text", "doc_id", "source", budget_ratio=1, max_epochs=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    per = spark.createDataFrame(
        [("small", 15), ("big", 4000)], "source string, n_tokens long"
    )
    q = {
        r["source"]: (r["capped"], r["token_quota"])
        for r in unimax_mixture_weights(
            per, "source", budget_ratio=1, max_epochs=2
        ).collect()
    }
    assert q["small"][0] and not q["big"][0]
    small = [r for r in out if r["source"] == "small"]
    big = [r for r in out if r["source"] == "big"]
    assert len(small) == 5 and len(big) == 40
    # capped source: every doc exactly max_epochs copies
    assert {r["n_copies"] for r in small} == {2}
    # uncapped source: greedy fill within quota, next doc overflows
    used = sum(r["n_copies"] * r["n_tok"] for r in big)
    quota = q["big"][1]
    assert used <= quota
    assert quota - used < 4000  # less than one full epoch left unfilled
    # full epochs are uniform: min copies = floor(quota/N)
    assert min(r["n_copies"] for r in big) == quota // 4000
    assert max(r["n_copies"] for r in big) <= quota // 4000 + 1


def test_unimax_assemble_zero_token_docs_respect_the_epoch_cap(spark):
    """A zero-token document consumes no budget, so the naive
    quota >= cum test holds AT exact saturation — it must still get
    exactly max_epochs copies in a capped source, never max_epochs+1
    (review r15)."""
    from farmrpg_etl_spark.operators.quality import unimax_assemble

    rows = [(0, "small", ""), (1, "small", "a b c"), (2, "small", "d e")]
    rows += [(100 + i, "big", "w x y z " * 25) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r["doc_id"]: r for r in unimax_assemble(
        df, "text", "doc_id", "source", budget_ratio=1, max_epochs=2
    ).collect()}
    # the capped source's docs — INCLUDING the empty one wherever it
    # lands in the md5 order — get exactly 2 copies
    assert {out[i]["n_copies"] for i in (0, 1, 2)} == {2}
    assert out[0]["n_tok"] == 0


def test_unimax_assemble_zero_token_doc_sorting_last_gets_full_epochs(
    spark,
):
    """The OTHER zero-token boundary (ADVICE r16): an empty document
    whose md5 key sorts LAST in a capped source has inclusive
    cum == N_s, and at quota == max_epochs·N_s the r15 strict rule
    (e·N + cum < quota) granted it only 1 copy. The position-robust
    rule (e·N + cum ≤ quota AND e·N < quota) must give it exactly
    max_epochs copies like every other doc in the capped source."""
    import hashlib

    from farmrpg_etl_spark.operators.quality import unimax_assemble

    key = lambda i: hashlib.md5(f"small|{i}".encode()).hexdigest()
    nonempty = [1, 2]
    # pick an empty-doc id whose md5(source|id) sorts after both
    # non-empty docs' keys — the test constructs the edge, it doesn't
    # hope for it
    empty_id = next(
        i
        for i in range(3, 2000)
        if key(i) > max(key(j) for j in nonempty)
    )
    rows = [(1, "small", "a b c"), (2, "small", "d e"),
            (empty_id, "small", "")]
    rows += [(100000 + i, "big", "w x y z " * 25) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r["doc_id"]: r for r in unimax_assemble(
        df, "text", "doc_id", "source", budget_ratio=1, max_epochs=2
    ).collect()}
    assert out[empty_id]["n_tok"] == 0
    assert {out[i]["n_copies"] for i in (1, 2, empty_id)} == {2}


def test_doremi_excess_weights_upweight_hard_domains(spark):
    """One DoReMi update against a frozen reference: the domain with
    higher mean NLL (excess loss) gets the larger weight; the easiest
    domain has excess exactly 0; weights normalize to ~1; the
    micro-quantized softmax is deterministic."""
    from farmrpg_etl_spark.operators.quality import doremi_excess_weights

    rows = [
        ("easy", 1.0), ("easy", 1.2), ("easy", 0.8),
        ("hard", 3.0), ("hard", 3.4),
        ("mid", 2.0), ("mid", 2.2),
    ]
    df = spark.createDataFrame(rows, "source string, nll double")
    out = {r["source"]: r for r in
           doremi_excess_weights(df, "source", eta=1.0).collect()}
    out2 = {r["source"]: r for r in
            doremi_excess_weights(df, "source", eta=1.0).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }
    assert out["easy"]["excess"] == 0.0
    assert out["hard"]["mean_nll"] == 3.2
    assert out["hard"]["excess"] == 2.2
    assert out["hard"]["weight"] > out["mid"]["weight"] > out["easy"]["weight"]
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 2e-6
    assert out["easy"]["n_docs"] == 3 and out["hard"]["n_docs"] == 2


def test_dsir_frozen_ratio_scores_unseen_buckets(spark):
    """The deployment regime: a ratio frozen on snapshot S must carry
    smoothed mass for EVERY bucket, so a later batch whose grams hash
    to buckets S never produced still gets the documented add-one
    logit — not a silently-dropped term (review r15: the inner
    scoring join used to eat those terms). Also: frozen-ratio scoring
    of the calibration corpus itself equals the fresh-fit scoring."""
    from farmrpg_etl_spark.operators.quality import (
        dsir_log_ratio,
        dsir_scored,
    )

    cal = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(100, "alpha beta alpha beta")], "doc_id long, text string"
    )
    B = 64
    ratio = dsir_log_ratio(cal, tgt, "text", "doc_id", n_buckets=B)
    # full bucket space: every bucket id present exactly once
    rows = ratio.collect()
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    # frozen-ratio scoring == fresh-fit scoring on the same corpus
    frozen = {r["doc_id"]: (r["logw"], r["gkey"]) for r in dsir_scored(
        cal, None, "text", "doc_id", n_buckets=B, ratio=ratio
    ).collect()}
    fresh = {r["doc_id"]: (r["logw"], r["gkey"]) for r in dsir_scored(
        cal, tgt, "text", "doc_id", n_buckets=B
    ).collect()}
    assert frozen == fresh
    # a LATER batch with vocabulary the calibration never saw: every
    # gram still contributes (logw nonzero through the smoothed lr),
    # and no row is dropped
    later = spark.createDataFrame(
        [(7, "zeta eta theta iota kappa")], "doc_id long, text string"
    )
    out = dsir_scored(
        later, None, "text", "doc_id", n_buckets=B, ratio=ratio
    ).collect()
    assert len(out) == 1
    assert out[0]["logw"] != 0.0
    # arg validation: neither target nor ratio is a loud error
    import pytest

    with pytest.raises(ValueError):
        dsir_scored(later, None, "text", "doc_id", n_buckets=B)


def test_doremi_iterated_weights_trajectory(spark):
    """The frozen-reference Hedge loop drifts toward the hardest
    domain: its weight increases monotonically with rounds, the
    easiest domain's decreases, weight_avg lies strictly between the
    uniform start and the final iterate for the hardest domain, and
    the trajectory is deterministic. rounds must be a positive int."""
    import pytest

    from farmrpg_etl_spark.operators.quality import doremi_iterated_weights

    rows = [
        ("easy", 1.0), ("easy", 1.2), ("easy", 0.8),
        ("hard", 3.0), ("hard", 3.4),
        ("mid", 2.0), ("mid", 2.2),
    ]
    df = spark.createDataFrame(rows, "source string, nll double")
    with pytest.raises(ValueError, match="rounds"):
        doremi_iterated_weights(df, "source", rounds=0)
    with pytest.raises(ValueError, match="rounds"):
        doremi_iterated_weights(df, "source", rounds=2.5)
    seen = []
    for k in (1, 2, 4):
        out = {r["source"]: r for r in
               doremi_iterated_weights(df, "source", eta=1.0,
                                       rounds=k).collect()}
        out2 = {r["source"]: r for r in
                doremi_iterated_weights(df, "source", eta=1.0,
                                        rounds=k).collect()}
        assert {s: tuple(v) for s, v in out.items()} == {
            s: tuple(v) for s, v in out2.items()
        }
        assert out["easy"]["excess"] == 0.0
        assert abs(sum(v["weight"] for v in out.values()) - 1.0) < 1e-4
        seen.append(out)
    hard = [o["hard"]["weight"] for o in seen]
    easy = [o["easy"]["weight"] for o in seen]
    assert hard[0] < hard[1] < hard[2]  # drifts toward one-hot
    assert easy[0] > easy[1] > easy[2]
    final = seen[-1]["hard"]
    # the published mixture is the average of iterates: strictly
    # inside (first iterate, final iterate) for the hardest domain
    assert hard[0] < final["weight_avg"] < final["weight"]
    # round 1 average == round 1 weight (one iterate)
    assert seen[0]["hard"]["weight_avg"] == seen[0]["hard"]["weight"]
