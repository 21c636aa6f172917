"""Property-based invariants (hypothesis) over the core operators.

Few examples per property — each example runs real Spark jobs — but
randomized inputs catch the classes unit fixtures miss: ties, nulls,
empty groups, duplicate rows.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from farmrpg_etl_spark.operators import dedup, latest

ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),                      # key
        st.integers(0, 5),                      # order
        st.integers(0, 10**6),                  # unique-ish tiebreak
        st.sampled_from(["a", "b", None]),      # payload
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(rows=ROWS)
@SETTINGS
def test_latest_strategies_agree(sp, rows):
    # make (order, tiebreak) unique per key so top-1 is well-defined
    seen: set[tuple] = set()
    uniq = []
    for k, o, tb, v in rows:
        if (k, o, tb) not in seen:
            seen.add((k, o, tb))
            uniq.append((k, o, tb, v))
    df = sp.createDataFrame(uniq, "k long, o long, tb long, v string")
    w = {
        (r["k"], r["o"], r["tb"], r["v"])
        for r in latest.latest_per_key(df, ["k"], "o", ["tb"]).collect()
    }
    a = {
        (r["k"], r["o"], r["tb"], r["v"])
        for r in latest.latest_per_key_agg(df, ["k"], "o", ["tb"]).collect()
    }
    assert w == a
    assert len(w) == len({k for k, *_ in uniq})


@given(rows=ROWS)
@SETTINGS
def test_keep_first_is_deterministic_subset(sp, rows):
    df = sp.createDataFrame(rows, "k long, o long, tb long, v string")
    out1 = sorted(map(tuple, dedup.keep_first_per_key(df, ["k"], "o", ["tb", "v"]).collect()))
    out2 = sorted(map(tuple, dedup.keep_first_per_key(df, ["k"], "o", ["tb", "v"]).collect()))
    assert out1 == out2  # deterministic under re-execution
    assert set(out1) <= set(map(tuple, rows))
    assert len(out1) == len({k for k, *_ in rows})


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=12
    )
)
@SETTINGS
def test_exact_dedup_idempotent(sp, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    once = dedup.exact_dedup(df, "text", "doc_id")
    twice = dedup.exact_dedup(once, "text", "doc_id")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # survivors are minimal ids of their normalization class
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    expect = {}
    for i, t in rows:
        expect.setdefault(norm(t), i)
    assert {r[0] for r in a} == set(expect.values())


ASOF_LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 10**6)),
    min_size=1, max_size=12,
)
ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 10**6)),
    min_size=0, max_size=12,
)


@given(lrows=ASOF_LEFT, rrows=ASOF_RIGHT)
@SETTINGS
def test_asof_join_matches_naive(sp, lrows, rrows):
    """asof_join (union + running-last window) == naive inequality join
    + row_number, on random keys/times/ties, including empty right
    sides and duplicate timestamps."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.asof import asof_join

    luniq = list({(k, t): i for k, t, i in lrows}.items())
    left = sp.createDataFrame(
        [(k, t, i) for (k, t), i in luniq], "k long, lts long, lid long"
    ).withColumn("lts", F.timestamp_seconds(F.col("lts")))
    right = sp.createDataFrame(
        rrows or [(99, 0, 0)], "k long, rts long, rid long"
    ).withColumn("rts", F.timestamp_seconds(F.col("rts")))

    fast = asof_join(left, right, "k", "lts", "rts", tiebreak="rid")
    naive = (
        left.join(right.withColumnRenamed("k", "rk"),
                  (F.col("k") == F.col("rk")) & (F.col("rts") <= F.col("lts")),
                  "left")
        .withColumn(
            "rn",
            F.row_number().over(
                # partition by (k, lts, lid): the generator dedups left
                # rows on (k, t) only, so lid can repeat across
                # timestamps — partitioning by (k, lid) alone would
                # collapse two distinct left rows into one window and
                # drop a naive-side row (hypothesis find; the operator
                # was right, this reference was wrong)
                Window.partitionBy("k", "lts", "lid").orderBy(
                    F.col("rts").desc_nulls_last(), F.col("rid").desc_nulls_last()
                )
            ),
        )
        .filter("rn = 1")
        .select("k", "lts", "lid", "rts", "rid")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


@given(lrows=ASOF_LEFT, rrows=ASOF_RIGHT)
@SETTINGS
def test_range_join_matches_naive(sp, lrows, rrows):
    """bucketed range_join == plain inequality join over the same
    half-open band, for random data and a band much wider than the
    bucket."""
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.asof import range_join

    left = sp.createDataFrame(
        [(k, t, i) for k, t, i in lrows], "k long, lts long, lid long"
    ).withColumn("lts", F.timestamp_seconds(F.col("lts")))
    right = sp.createDataFrame(
        rrows or [(99, 0, 0)], "k long, rts long, rid long"
    ).withColumn("rts", F.timestamp_seconds(F.col("rts")))

    fast = range_join(left, right, "k", "lts", "rts", -7.0, 3.0, bucket_sec=2.0)
    naive = left.join(right.withColumnRenamed("k", "rk"),
                      (F.col("k") == F.col("rk"))
                      & (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 7 SECONDS"))
                      & (F.col("rts") < F.col("lts") + F.expr("INTERVAL 3 SECONDS")))
    a = sorted((r.k, r.lid, r.rid) for r in fast.collect())
    b = sorted((r.k, r.lid, r.rid) for r in naive.collect())
    assert a == b


@given(
    pairs=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 50)),
        min_size=1,
        max_size=30,
        unique_by=lambda p: p[0],
    ),
    nb=st.integers(1, 9),
)
@SETTINGS
def test_global_prefix_sum_is_exact_running_total(sp, pairs, nb):
    from farmrpg_etl_spark.operators.chunking import global_prefix_sum

    df = sp.createDataFrame(pairs, "k long, v long")
    got = {
        r.k: r.cum
        for r in global_prefix_sum(df, "k", "v", "cum", num_buckets=nb).collect()
    }
    run = 0
    for k, v in sorted(pairs):
        run += v
        assert got[k] == run


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\t\n"), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 4),
)
@SETTINGS
def test_shingles_and_ngrams_match_python_reference(sp, texts, k):
    """The arrays_zip-based implementations must agree with the obvious
    Python sliding window for any whitespace mess."""
    from farmrpg_etl_spark.functions.hashing import shingles, word_ngrams
    from pyspark.sql import functions as F

    df = sp.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r.i: (r.sh, r.ng)
        for r in df.select(
            "i",
            shingles(F.col("text"), k).alias("sh"),
            word_ngrams(F.col("text"), k).alias("ng"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().strip().split() if w]
        full = [" ".join(toks[j : j + k]) for j in range(max(len(toks) - k + 1, 1))]
        want_sh = full if toks else []
        want_ng = (
            [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
            if len(toks) >= k
            else []
        )
        assert got[i] == (want_sh, want_ng), (t, toks)


DOC_ROWS = st.lists(
    st.tuples(
        st.integers(0, 30),  # doc id (dupes dropped below)
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=9
        ),  # tokens
    ),
    min_size=1,
    max_size=12,
)


@given(rows=DOC_ROWS)
@SETTINGS
def test_chunk_dedup_invariants(sp, rows):
    """(1) kept chunk multiset has no duplicate chunk text corpus-wide;
    (2) token conservation: clean_tokens + dropped·size bounds;
    (3) no-duplicate corpora pass through unchanged."""
    docs = {}
    for i, toks in rows:
        docs.setdefault(i, " ".join(toks))
    df = sp.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_duplicated_chunks(
            df, "text", "doc_id", size=3
        ).collect()
    }
    assert set(out) == set(docs)
    from farmrpg_etl_spark.operators.chunking import chunk_by_tokens

    kept_total = sum(r["n_kept"] for r in out.values())
    chunks = chunk_by_tokens(df, "text", "doc_id", size=3, stride=3).filter(
        "n_chunk_tokens > 0"
    )
    distinct_chunks = chunks.select("chunk").distinct().count()
    # exactly one survivor per distinct chunk text
    assert kept_total == distinct_chunks
    for r in out.values():
        assert r["n_kept"] + r["n_dropped"] == r["n_chunks"]
        assert 0 <= r["clean_tokens"] <= 3 * r["n_kept"]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1000000),           # unique-ish order key source
            st.sampled_from(["g1", "g2"]),     # group
            st.integers(-5, 5),                # value
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_grouped_prefix_sum_property(sp, rows):
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.chunking import grouped_prefix_sum

    uniq = {}
    for i, g, v in rows:
        uniq.setdefault((g, hashlib.md5(str(i).encode()).hexdigest()), v)
    data = [(g, h, v) for (g, h), v in uniq.items()]
    df = sp.createDataFrame(data, "grp string, h string, v long")
    got = {
        (r["grp"], r["h"]): r["cum"]
        for r in grouped_prefix_sum(df, ["grp"], "h", "v").collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["grp"], r["h"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


DOCS = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=12,
)


@given(docs=DOCS)
@SETTINGS
def test_duplicated_spans_bounds_property(sp, docs):
    """dup_tok is always within [0, n_tok]; an exact duplicate pair of
    length >= k is fully covered on both sides."""
    from pyspark.sql import functions as F

    uniq = {i: " ".join(toks) for i, toks in docs}
    data = list(uniq.items())
    # plant one guaranteed duplicate pair of length k
    data += [(10**7, "x y z"), (10**7 + 1, "x y z")]
    df = sp.createDataFrame(data, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.duplicated_spans(df, "text", "doc_id", k=3).collect()}
    assert len(out) == len(data)
    for r in out.values():
        assert 0 <= r.dup_tok <= r.n_tok
    assert out[10**7].dup_tok == 3 and out[10**7 + 1].dup_tok == 3


@given(docs=DOCS)
@SETTINGS
def test_quality_weighted_sample_is_subset_and_monotone(sp, docs):
    """The kept set is a subset, deterministic, and monotone in the
    weight: raising every weight can only keep a superset."""
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.curation import quality_weighted_sample

    uniq = {i: min(1.0, len(toks) / 12.0) for i, toks in docs}
    df = sp.createDataFrame(list(uniq.items()), "doc_id long, quality double")
    kept_lo = {r.doc_id for r in quality_weighted_sample(df, "doc_id", "quality").collect()}
    hi = df.withColumn("quality", F.least(F.lit(1.0), F.col("quality") + 0.5))
    kept_hi = {r.doc_id for r in quality_weighted_sample(hi, "doc_id", "quality").collect()}
    assert kept_lo <= set(uniq)
    assert kept_lo <= kept_hi


@given(docs=DOCS)
@SETTINGS
def test_cut_spans_complements_detection(sp, docs):
    """cut ∘ detect complement: kept_tok + dup_tok == n_tok for every
    document on arbitrary corpora (cutting removes exactly the
    measured coverage); re-tokenizing text_cut yields kept_tok."""
    from pyspark.sql import functions as F

    uniq = {i: " ".join(toks) for i, toks in docs}
    df = sp.createDataFrame(list(uniq.items()), "doc_id long, text string")
    cut = {r.doc_id: r for r in dedup.cut_duplicated_spans(df, "text", "doc_id", k=3).collect()}
    det = {r.doc_id: r for r in dedup.duplicated_spans(df, "text", "doc_id", k=3).collect()}
    assert set(cut) == set(det) == set(uniq)
    for i in uniq:
        assert cut[i].kept_tok + det[i].dup_tok == det[i].n_tok, i
        toks = [t for t in cut[i].text_cut.split(" ") if t]
        assert len(toks) == cut[i].kept_tok, i


@given(docs=DOCS, n_merges=st.integers(1, 3))
@SETTINGS
def test_bpe_token_counts_bounds_and_monotone(sp, docs, n_merges):
    """BPE encoding invariants: n_words <= n_bpe_tokens <= total chars
    of the doc's words, and more merge rounds never increase any
    document's token count."""
    from farmrpg_etl_spark.operators.curation import bpe_token_counts

    uniq = {i: " ".join(toks) for i, toks in docs}
    df = sp.createDataFrame(list(uniq.items()), "doc_id long, text string")
    few = {r.doc_id: r for r in bpe_token_counts(df, "text", "doc_id", n_merges=n_merges).collect()}
    more = {r.doc_id: r for r in bpe_token_counts(df, "text", "doc_id", n_merges=n_merges + 1).collect()}
    for i, text in uniq.items():
        ws = [w for w in text.lower().split() if w]
        assert few[i].n_words == len(ws)
        assert few[i].n_bpe_tokens >= few[i].n_words
        assert few[i].n_bpe_tokens <= sum(len(w) for w in ws)
        assert more[i].n_bpe_tokens <= few[i].n_bpe_tokens, i


def test_prefix_sums_handle_negative_values(sp):
    """Pinned regression (hypothesis r5 find): bucket totals must be
    sum(value), not max(running sum) — max under-counts any bucket
    whose running total dips (negative values). Both prefix-sum forms."""
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.chunking import (
        global_prefix_sum,
        grouped_prefix_sum,
    )

    vals = [5, -7, 3, -1, 0, 2, -4, 9]
    data = [
        ("g", hashlib.md5(str(i).encode()).hexdigest(), v)
        for i, v in enumerate(vals)
    ]
    df = sp.createDataFrame(data, "grp string, h string, v long")
    got = {
        r["h"]: r["cum"]
        for r in grouped_prefix_sum(df, ["grp"], "h", "v").collect()
    }
    w = (
        Window.partitionBy("grp").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["h"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want

    gdf = sp.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    got_g = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(gdf, "k", "v", num_buckets=3).collect()
    }
    run, want_g = 0, {}
    for i, v in enumerate(vals):
        run += v
        want_g[i] = run
    assert got_g == want_g


PQ_VECS = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.lists(st.integers(-1000, 1000), min_size=8, max_size=8),
    ),
    min_size=1, max_size=12,
)


@given(rows=PQ_VECS)
@SETTINGS
def test_pq_encode_matches_numpy_argmin(sp, rows):
    """pq_encode == numpy nearest-centroid with lowest-index ties, on
    random integer-valued vectors (exact in doubles, so cross-impl
    float disagreement is impossible and any mismatch is logic)."""
    import numpy as np

    from farmrpg_etl_spark.operators.similarity import pq_codebooks, pq_encode

    uniq = list({i: v for i, v in rows}.items())
    df = sp.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in uniq],
        "vec_id long, v array<double>",
    )
    got = {r["vec_id"]: (r["c0"], r["c1"])
           for r in pq_encode(df, "v", "vec_id", dim=8, m=2, ks=4).collect()}
    books = np.array(pq_codebooks(8, 2, 4))
    for i, v in uniq:
        a = np.array(v, dtype=np.float64)
        want = tuple(
            int(((a[s * 4:(s + 1) * 4] - books[s]) ** 2).sum(1).argmin())
            for s in range(2)
        )
        assert got[i] == want, (i, v)


CDF_ROWS = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 3)),  # (key, value)
    min_size=0, max_size=10,
)


@given(a=CDF_ROWS, b=CDF_ROWS)
@SETTINGS
def test_version_changes_matches_naive_diff(sp, a, b, tmp_path_factory):
    """version_changes == a per-key dict diff, on random snapshots:
    inserts/deletes/update image pairs, unchanged suppressed."""
    from farmrpg_etl_spark.sinks.writers import ParquetTable, version_changes

    da = dict(a)
    db = dict(b)
    t = ParquetTable(sp, str(tmp_path_factory.mktemp("cdfp")), keep_versions=3)
    mk = lambda d: sp.createDataFrame(
        [(k, float(v)) for k, v in d.items()] or [(99, 0.0)],
        "k long, v double",
    ).filter("k < 99" if not d else "k >= 0")
    t._commit(mk(da), batch_id=0)
    t._commit(mk(db), batch_id=1)
    got = {(r["_change_type"], r["k"]): r["v"]
           for r in version_changes(t, 0, 1, ["k"]).collect()}
    want = {}
    for k in set(da) | set(db):
        if k in da and k not in db:
            want[("delete", k)] = float(da[k])
        elif k in db and k not in da:
            want[("insert", k)] = float(db[k])
        elif da[k] != db[k]:
            want[("update_preimage", k)] = float(da[k])
            want[("update_postimage", k)] = float(db[k])
    assert got == want


# --- r9 operator properties ----------------------------------------------

WORD = st.text(alphabet="abcd", min_size=1, max_size=4)
LINE_DOCS = st.lists(
    st.tuples(st.integers(0, 50), st.lists(WORD, min_size=0, max_size=6)),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(docs=LINE_DOCS)
@SETTINGS
def test_line_dedup_identity_when_threshold_unreachable(sp, docs):
    """With min_count above any possible corpus frequency, every
    document round-trips byte-identically (split/reassemble is
    lossless, including empty lines)."""
    from farmrpg_etl_spark.operators.linededup import remove_frequent_lines

    rows = [(i, "\n".join(ws)) for i, ws in docs]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text_out for r in
           remove_frequent_lines(df, "text", "doc_id", min_count=10**6)
           .collect()}
    assert out == dict(rows)


@given(docs=LINE_DOCS)
@SETTINGS
def test_line_dedup_census_consistency(sp, docs):
    """n_kept <= n_lines always; a line survives iff its corpus
    frequency is below the threshold (checked via a python oracle)."""
    from collections import Counter

    from farmrpg_etl_spark.operators.linededup import remove_frequent_lines

    rows = [(i, "\n".join(ws)) for i, ws in docs]
    freq = Counter(l for _, t in rows for l in t.split("\n"))
    df = sp.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_frequent_lines(df, "text", "doc_id", min_count=2)
           .collect()}
    for i, t in rows:
        lines = t.split("\n")
        kept = [l for l in lines if freq[l] < 2]
        assert out[i].n_lines == len(lines)
        assert out[i].n_kept == len(kept)
        assert out[i].text_out == "\n".join(kept)


EVENT_SETS = st.lists(
    st.tuples(
        st.integers(0, 3),                    # user
        st.integers(0, 48),                   # hour offset
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


@given(evs=EVENT_SETS)
@SETTINGS
def test_funnel_counts_are_monotone(sp, evs):
    """Completing step k+1 requires completing step k, so the summary
    counts must be non-increasing for every random event set."""
    import datetime as dt

    from farmrpg_etl_spark.operators.funnel import funnel, funnel_summary

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), u, t)
        for i, (u, h, t) in enumerate(evs)
    ]
    df = sp.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    counts = {r.step: r.n_users for r in
              funnel_summary(funnel(df, ["view", "click", "purchase"]), 3)
              .collect()}
    assert counts[1] >= counts[2] >= counts[3]


GRAPHS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),  # directed edges
    min_size=1,
    max_size=25,
)


@given(edges=GRAPHS)
@SETTINGS
def test_pagerank_mass_conservation_and_floor(sp, edges):
    """For any graph where every NODE has out-degree >= 1 (we add a
    self-loop to sinks), total rank stays ~1 (quantization only
    floors: deficit < nodes*rounds*1e-6) and every rank is at least
    the teleport floor."""
    from farmrpg_etl_spark.operators.graph import DAMPING, pagerank

    nodes = sorted({n for e in edges for n in e})
    srcs = {a for a, _ in edges}
    full = list(edges) + [(n, n) for n in nodes if n not in srcs]
    ndf = sp.createDataFrame([(n,) for n in nodes], "id long")
    edf = sp.createDataFrame(full, "src long, dst long")
    n_iter = 3
    ranks = [r.rank for r in pagerank(ndf, edf, n_iter=n_iter).collect()]
    n = len(nodes)
    floor = (1 - DAMPING) / n
    assert all(r >= floor - 1e-12 for r in ranks)
    total = sum(ranks)
    assert total <= 1.0 + 1e-9
    assert total >= 1.0 - n * n_iter * 3e-6


ATTR_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2),                        # user
        st.integers(0, 72),                       # hour
        st.sampled_from(["click", "purchase"]),
    ),
    min_size=1,
    max_size=25,
)


@given(evs=ATTR_EVENTS)
@SETTINGS
def test_linear_attribution_conserves_credit(sp, evs):
    """Each conversion with >= 1 in-window touch distributes exactly
    ~1 unit of credit (floor-quantized: deficit < n_touches micro),
    and total credit never exceeds the attributable conversions."""
    import datetime as dt

    from farmrpg_etl_spark.operators.funnel import linear_attribution

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), u, t)
        for i, (u, h, t) in enumerate(evs)
    ]
    df = sp.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = linear_attribution(df).collect()
    total_credit = sum(r.credit for r in out)
    # python oracle: conversions that have at least one in-window touch
    convs = [(u, ts) for _, ts, u, t in rows if t == "purchase"]
    touches = [(u, ts) for _, ts, u, t in rows if t == "click"]
    attributable = sum(
        1
        for cu, cts in convs
        if any(
            tu == cu and tts < cts and tts > cts - dt.timedelta(hours=24)
            for tu, tts in touches
        )
    )
    assert total_credit <= attributable + 1e-9
    assert total_credit >= attributable - attributable * 25e-6


@given(
    counts=st.lists(
        st.tuples(
            st.integers(0, 9),                 # source tag
            st.integers(1, 10**13),            # n_tokens (up to 10T)
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    ratio=st.integers(1, 4),
    epochs=st.integers(1, 4),
)
@SETTINGS
def test_unimax_water_filling_invariants(sp, counts, ratio, epochs):
    """The closed-form UniMax allocation must, for ANY count vector
    (including trillion-token values), (a) never exceed a source's
    epoch cap, (b) never exceed the budget in total, (c) give every
    capped source EXACTLY its cap, (d) match the independent
    iterative water-filling reference integer for integer."""
    from math import floor, sqrt

    from farmrpg_etl_spark.operators.quality import unimax_mixture_weights

    data = [(f"s{t}", n) for t, n in counts]
    per = sp.createDataFrame(data, "source string, n_tokens long")
    rows = unimax_mixture_weights(
        per, "source", budget_ratio=ratio, max_epochs=epochs
    ).collect()
    budget = ratio * sum(n for _, n in data)
    # independent reference (same as test_quality_ops)
    m = {s: floor(sqrt(n * sqrt(n)) * 1e6) for s, n in data}
    cmap = dict(data)
    capped = set()
    while True:
        b_rem = budget - sum(epochs * cmap[s] for s in capped)
        m_rem = sum(mi for s, mi in m.items() if s not in capped)
        newly = {
            s for s in cmap
            if s not in capped
            and b_rem * m[s] >= epochs * cmap[s] * m_rem
        }
        if not newly:
            break
        capped |= newly
    b_rem = budget - sum(epochs * cmap[s] for s in capped)
    m_rem = sum(mi for s, mi in m.items() if s not in capped)
    total = 0
    for r in rows:
        cap = epochs * cmap[r["source"]]
        assert r["token_quota"] <= cap
        total += r["token_quota"]
        if r["capped"]:
            assert r["source"] in capped
            assert r["token_quota"] == cap
        else:
            assert r["source"] not in capped
            assert r["token_quota"] == b_rem * m[r["source"]] // m_rem
    assert total <= budget


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 2),     # source index
            st.integers(0, 12),    # token count (0 = empty doc)
        ),
        min_size=1,
        max_size=12,
    ),
    ratio=st.integers(1, 3),
    epochs=st.integers(1, 3),
)
@SETTINGS
def test_unimax_assemble_epoch_fill_property(sp, docs, ratio, epochs):
    """The materialized schedule must, for ANY corpus shape (zero-
    token docs anywhere in the md5 order, any budget_ratio/max_epochs):
    (a) never let a source's Σ n_copies·n_tok exceed its quota,
    (b) give every doc of a capped source exactly max_epochs copies,
    (c) match the independent epoch-membership reference — a doc is
    in epoch e iff e·N + cum ≤ quota AND e·N < quota — doc for doc
    (the r15/r16 zero-token boundary rule, checked at BOTH ends of
    the order because hypothesis controls the md5 positions only
    indirectly through ids)."""
    import hashlib

    from farmrpg_etl_spark.operators.quality import (
        unimax_assemble,
        unimax_mixture_weights,
    )

    rows = [
        (i, f"s{t}", "t " * n) for i, (t, n) in enumerate(docs)
    ]
    df = sp.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in unimax_assemble(
            df, "text", "doc_id", "source",
            budget_ratio=ratio, max_epochs=epochs,
        ).collect()
    }
    per = [
        (s, sum(n for _, (t2, n) in enumerate(docs) if f"s{t2}" == s))
        for s in sorted({f"s{t}" for t, _ in docs})
    ]
    q = {
        r["source"]: (r["capped"], r["token_quota"], dict(per)[r["source"]])
        for r in unimax_mixture_weights(
            sp.createDataFrame(per, "source string, n_tokens long"),
            "source", budget_ratio=ratio, max_epochs=epochs,
        ).collect()
    }
    # independent reference: md5 order + inclusive cumsum + epoch rule
    for s, (capped, quota, n_s) in q.items():
        members = [
            (hashlib.md5(f"{s}|{i}".encode()).hexdigest(), i, n)
            for i, (t, n) in enumerate(docs)
            if f"s{t}" == s
        ]
        members.sort()
        cum = 0
        used = 0
        for _, i, n in members:
            cum += n
            if n_s == 0:
                want = 0
            else:
                want = len([
                    e for e in range(0, ratio * epochs + 2)
                    if e * n_s + cum <= quota and e * n_s < quota
                ])
            assert out[i]["n_copies"] == want, (s, i, n, cum, quota, n_s)
            used += out[i]["n_copies"] * n
            # the docstring invariant (capped => exactly max_epochs
            # copies) presumes a source with tokens; an all-empty
            # source caps at quota 0 and replicates nothing
            if capped and n_s > 0:
                assert out[i]["n_copies"] == epochs, (s, i)
        assert used <= quota
