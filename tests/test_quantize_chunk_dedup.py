"""Unit semantics for int8 quantization and sub-document chunk dedup.

Quantization is pinned against hand-computed int8 codes (including the
all-zero-vector guard and the no-clamp-needed 127 bound); chunk dedup
is pinned on a corpus where one 4-token chunk repeats across documents
— the first (doc, position) occurrence must win and reassembly must
preserve chunk order.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from farmrpg_etl_spark.operators import dedup, similarity


def test_int8_quantize_codes_and_scale(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in similarity.int8_quantize(df, "embedding", "vec_id").collect()
    }
    # scale = 1.0/127; codes round(x*127): [127, -64 (63.5 HALF_UP), 32, 0]
    assert abs(rows[1]["scale"] - 1.0 / 127) < 1e-12
    assert rows[1]["qvec"] == [127, -64, 32, 0]
    assert max(abs(c) for c in rows[1]["qvec"]) <= 127  # bound, no clamp
    assert rows[2]["scale"] == 0.0 and rows[2]["qvec"] == [0, 0, 0, 0]


def test_quantized_ann_matches_bruteforce_ranking_when_error_is_small(spark):
    # well-separated directions: quantization noise cannot flip ranks
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    exact = similarity.ann_topk_bruteforce(df, q, "embedding", "vec_id", k=3)
    quant = similarity.ann_topk_quantized(df, q, "embedding", "vec_id", k=3)
    order = lambda res: [r["neighbor_id"] for r in res.orderBy("rank").collect()]
    assert order(exact) == order(quant) == [1, 2, 3]


def test_chunk_dedup_first_occurrence_wins_and_reassembles(spark):
    # size=2 chunks; doc 1 = [a b][c d], doc 2 = [a b][x y]: doc 2's
    # first chunk is a duplicate of doc 1's and must be dropped.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.dedup_duplicated_chunks(
            df, "text", "doc_id", size=2
        ).collect()
    }
    assert (rows[1]["n_chunks"], rows[1]["n_kept"], rows[1]["n_dropped"]) == (2, 2, 0)
    assert rows[1]["clean_digest"] == hashlib.md5(b"a b c d").hexdigest()
    assert (rows[2]["n_chunks"], rows[2]["n_kept"], rows[2]["n_dropped"]) == (2, 1, 1)
    assert rows[2]["clean_tokens"] == 2
    assert rows[2]["clean_digest"] == hashlib.md5(b"x y").hexdigest()
    # empty document: present in the output, zero chunks, empty digest
    assert (rows[3]["n_chunks"], rows[3]["n_kept"]) == (0, 0)
    assert rows[3]["clean_digest"] == hashlib.md5(b"").hexdigest()


def test_chunk_dedup_within_document_repeats(spark):
    # the same chunk twice INSIDE one document: position 0 wins
    df = spark.createDataFrame([(7, "a b a b")], "doc_id long, text string")
    row = dedup.dedup_duplicated_chunks(df, "text", "doc_id", size=2).collect()[0]
    assert (row["n_chunks"], row["n_kept"], row["n_dropped"]) == (2, 1, 1)
    assert row["clean_digest"] == hashlib.md5(b"a b").hexdigest()


def test_grouped_prefix_sum_matches_single_partition_window(spark):
    from pyspark.sql import Window

    from farmrpg_etl_spark.operators.chunking import grouped_prefix_sum

    df = spark.createDataFrame(
        [(g, i, f"{h:02x}rest", v) for g, i, h, v in [
            ("a", 1, 0x03, 10), ("a", 2, 0x7f, 5), ("a", 3, 0x80, 7),
            ("a", 4, 0xff, 1), ("b", 5, 0x10, 100), ("b", 6, 0x10 + 1, 50),
        ]],
        "grp string, id long, h string, v long",
    )
    got = {
        r["id"]: r["cum"]
        for r in grouped_prefix_sum(df, ["grp"], "h", "v", bucket_chars=1).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_token_budget_mixture_respects_budget(spark):
    from farmrpg_etl_spark.operators import quality

    df = spark.createDataFrame(
        [(i, "w " * 10, "s1") for i in range(10)]
        + [(100 + i, "w " * 10, "s2") for i in range(10)],
        "doc_id long, text string, source string",
    )
    kept = quality.token_budget_mixture(
        df, "text", "doc_id", "source", {"s1": 35, "s2": 1000}
    )
    per = {
        r["source"]: (r["n"], r["tok"])
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
        .collect()
    }
    # each doc is 10 tokens: s1 fits 3 whole docs in 35; s2 keeps all 10
    assert per["s1"] == (3, 30)
    assert per["s2"] == (10, 100)
    # unknown sources fall to default_budget=0: nothing kept
    none_kept = quality.token_budget_mixture(df, "text", "doc_id", "source", {})
    assert none_kept.count() == 0


def test_salted_join_equals_plain_join(spark):
    from farmrpg_etl_spark.operators import joins

    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(100)]
        + [(1000, "orphan")],
        "id long, k string",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("unused", 3)], "k string, v long"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["id"], r["v"])
            for r in joins.salted_join(left, right, "k", 4, how).collect()
        )
        want = sorted(
            (r["id"], r["v"]) for r in left.join(right, "k", how).collect()
        )
        assert got == want
    import pytest

    with pytest.raises(ValueError):
        joins.salted_join(left, right, "k", 4, "full")


def test_salted_join_shuffles_on_key_and_salt(spark):
    from farmrpg_etl_spark.operators import joins

    left = spark.createDataFrame([(1, "a")], "id long, k string")
    right = spark.createDataFrame([("a", 1)], "k string, v long")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            joins.salted_join(left, right, "k", 4)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning(k" in plan and "__salt" in plan


# --------------------------------------- incremental LSH signature path
def test_incremental_pairs_signature_table_path_matches_text_path(spark, tmp_path):
    from farmrpg_etl_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" tail {i % 3}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    indexed = df.filter(F.col("doc_id") < 10)
    new = df.filter(F.col("doc_id") >= 10)
    p_text, idx1 = dd.incremental_minhash_pairs(
        indexed, new, "text", "doc_id", num_hashes=16, bands=4, threshold=0.3
    )
    # materialize the signature table (what a previous ingest persisted),
    # then read it back so the plan genuinely starts from signatures
    sig_path = str(tmp_path / "sigs.parquet")
    dd.minhash_signatures(indexed, "text", "doc_id", 16, 3).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)
    p_sig, idx2 = dd.incremental_minhash_pairs(
        None, new, "text", "doc_id", num_hashes=16, bands=4, threshold=0.3,
        indexed_sigs=stored,
    )
    assert sorted(map(tuple, p_text.collect())) == sorted(map(tuple, p_sig.collect()))
    # the updated index covers the whole corpus either way
    assert idx1.count() == idx2.count() == 20
    idx1.unpersist(); idx2.unpersist()


def test_incremental_pairs_signature_path_never_scans_indexed_text(spark, tmp_path):
    from farmrpg_etl_spark.operators import dedup as dd

    rows = [(i, f"alpha beta gamma delta epsilon {i % 4}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sig_path = str(tmp_path / "sigs2.parquet")
    dd.minhash_signatures(
        df.filter(F.col("doc_id") < 6), "text", "doc_id", 16, 3
    ).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)
    p_sig, idx = dd.incremental_minhash_pairs(
        None, df.filter(F.col("doc_id") >= 6), "text", "doc_id",
        num_hashes=16, bands=4, threshold=0.0, indexed_sigs=stored,
    )
    # plan proof: exactly one text-bearing leaf relation — the ARRIVING
    # batch (filter doc_id >= 6); the indexed side enters as signatures
    # (cached union of the sig parquet), so its text is nowhere in the plan
    plan = p_sig._jdf.queryExecution().optimizedPlan().toString()
    text_leaves = re.findall(r"LogicalRDD \[doc_id#\d+, text#\d+\]", plan)
    assert len(text_leaves) == 1
    assert ">= 6" in plan and "< 6" not in plan
    p_sig.collect()
    idx.unpersist()


def test_incremental_pairs_requires_one_indexed_form(spark):
    from farmrpg_etl_spark.operators import dedup as dd

    new = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    import pytest as _pt
    with _pt.raises(ValueError):
        dd.incremental_minhash_pairs(None, new, "text", "doc_id")


# ------------------------------------------- neardup deep-chain lineage
def test_neardup_clusters_deep_path_graph(spark):
    from farmrpg_etl_spark.operators import dedup as dd

    # path graph 0-1-2-...-24: diameter 24 > max label-propagation
    # rounds of a shallow LSH graph; exercises the per-round
    # localCheckpoint (flat lineage) and full min-label convergence
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(24)], "id_a int, id_b int, jaccard double"
    )
    labels = dd.neardup_clusters(pairs, max_iters=30)
    got = labels.collect()
    assert len(got) == 25
    assert all(r.cluster_id == 0 for r in got)


def test_leakage_safe_splits_keep_families_together(spark):
    """The split key hashes the CLUSTER id: every member of a near-dup
    family gets the family's split; singletons are their own cluster;
    assignment is deterministic and total (every doc exactly one
    split)."""
    from farmrpg_etl_spark.operators.dedup import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # three families with scattered member ids + 194 singletons
    clusters = spark.createDataFrame(
        [(1, 1), (150, 1), (199, 1), (7, 7), (8, 7), (20, 20), (21, 20)],
        "id long, cluster_id long",
    )
    out = leakage_safe_splits(docs, "doc_id", clusters).collect()
    out2 = leakage_safe_splits(docs, "doc_id", clusters).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    assert len(out) == 200
    by_id = {r["doc_id"]: r for r in out}
    # family members share cluster AND split
    for fam in ([1, 150, 199], [7, 8], [20, 21]):
        splits = {by_id[i]["split"] for i in fam}
        cids = {by_id[i]["cluster_id"] for i in fam}
        assert len(splits) == 1 and cids == {fam[0]}, fam
    # singletons are their own cluster
    assert by_id[100]["cluster_id"] == 100
    # all three splits are populated at this size and the shares are
    # in sane bands (md5 buckets: 80/10/10 nominal)
    from collections import Counter

    c = Counter(r["split"] for r in out)
    assert set(c) == {"train", "valid", "test"}
    assert c["train"] > c["valid"] and c["train"] > c["test"]


def test_leakage_safe_splits_validates_percentages(spark):
    """Misconfigured split percentages fail LOUDLY (ADVICE r16):
    pcts summing past 100 would otherwise silently empty the test
    split, negatives would shift every row into one split."""
    import pytest

    from farmrpg_etl_spark.operators.dedup import leakage_safe_splits

    docs = spark.createDataFrame([(1,)], "doc_id long")
    clusters = spark.createDataFrame([], "id long, cluster_id long")
    for train, valid in [(95, 10), (-1, 10), (80, -5), (101, 0)]:
        with pytest.raises(ValueError, match="leakage_safe_splits"):
            leakage_safe_splits(
                docs, "doc_id", clusters, train_pct=train, valid_pct=valid
            )
    with pytest.raises(ValueError, match="leakage_safe_splits"):
        leakage_safe_splits(
            docs, "doc_id", clusters, train_pct=80.0, valid_pct=10
        )
    # the boundary itself is legal: 90/10/0 just has an empty test
    # split the caller asked for
    leakage_safe_splits(docs, "doc_id", clusters, train_pct=90,
                        valid_pct=10)
