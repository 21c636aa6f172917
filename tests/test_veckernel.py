"""Arrow prune + Catalyst rescore kernel (operators/veckernel.py):
the vectorized impls must be BIT-identical to the pure-Catalyst
impls — same rounded values, same ranks, same tie-breaks — because the
rescore phase reuses the exact Catalyst fold expressions on the same
double inputs. Also pins the candidate-sufficiency edge cases (rounded
ties at the k boundary, zero vectors, self-match exclusion)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from farmrpg_etl_spark.functions import vectors as V
from farmrpg_etl_spark.operators import similarity, veckernel


def _random_vecs(n, dim, seed):
    rng = random.Random(seed)
    return [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]


def test_ann_bruteforce_arrow_matches_catalyst_exactly(spark):
    rows = _random_vecs(300, 8, seed=7)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 5)
    got = {}
    for impl in ("arrow", "catalyst"):
        got[impl] = sorted(
            map(
                tuple,
                similarity.ann_topk_bruteforce(
                    df, q, "embedding", "vec_id", k=7, impl=impl
                ).collect(),
            )
        )
    assert got["arrow"] == got["catalyst"]
    assert len(got["arrow"]) == 5 * 7


def test_ann_arrow_rounded_tie_break_prefers_low_id(spark):
    # three corpus vectors with IDENTICAL direction (exact rounded-score
    # ties) plus distractors: the final ordering is (cosine desc, id
    # asc), so the tied low ids must win in BOTH impls — this is the
    # knife-edge the candidate slack exists for.
    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(100, base)]
    for i, s in [(10, 2.0), (11, 0.5), (12, 4.0)]:
        rows.append((i, [x * s for x in base]))
    rows += _random_vecs(50, 4, seed=3)[20:]  # ids 20..49 distractors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 100)
    for impl in ("arrow", "catalyst"):
        top = (
            similarity.ann_topk_bruteforce(
                df, q, "embedding", "vec_id", k=3, impl=impl
            )
            .orderBy("rank")
            .collect()
        )
        assert [r["neighbor_id"] for r in top] == [10, 11, 12], impl
        assert all(r["cosine"] == 1.0 for r in top), impl


def test_ann_arrow_zero_vectors_and_self_match(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id").isin(0, 1))
    for impl in ("arrow", "catalyst"):
        out = similarity.ann_topk_bruteforce(
            df, q, "embedding", "vec_id", k=4, impl=impl
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        # self never appears
        assert all(r["neighbor_id"] != r["query_id"] for r in out), impl
        # zero-vector query scores 0 against everything
        assert {r["cosine"] for r in by_q[0]} == {0.0}, impl
        assert len(by_q[0]) == 3 and len(by_q[1]) == 3, impl


def test_topk_candidates_cover_every_batch(spark):
    # many partitions → many small batches; global top-k must still be
    # exact because candidates are per-batch top-(k+slack)
    rows = _random_vecs(200, 6, seed=11)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16)
    q_rows = [r for r in rows if r[0] < 3]
    cand = veckernel.topk_candidates(
        df, "embedding", "vec_id", q_rows, k=5, slack=2
    )
    got = cand.groupBy("query_id").count().collect()
    assert all(r["count"] >= 5 for r in got)
    # brute-force python check of final top-1 per query
    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    cand_ids = {
        (r["query_id"], r["neighbor_id"]) for r in cand.collect()
    }
    for qid, qv in q_rows:
        best = max(
            (r for r in rows if r[0] != qid),
            key=lambda r: (round(cos(qv, r[1]), 6), -r[0]),
        )
        assert (qid, best[0]) in cand_ids


def test_nearest_candidates_match_full_scan(spark):
    rows = _random_vecs(120, 5, seed=23)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [(c, [float(c), 0.5 * c, -0.25 * c, 1.0, 0.0]) for c in range(8)]
    cand = veckernel.nearest_candidates(df, "v", "vec_id", cents, n_cand=2)
    got = {}
    for r in cand.collect():
        got.setdefault(r["vec_id"], []).append(r["cluster"])

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for vid, vv in rows:
        best = min(cents, key=lambda c: (d2(vv, c[1]), c[0]))
        assert best[0] in got[vid]
        assert len(got[vid]) == 2


def test_nearest_candidates_duplicate_centroid_tie_break(spark):
    rows = [(0, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [(5, [1.0, 1.0]), (2, [1.0, 1.0]), (9, [9.0, 9.0])]
    cand = veckernel.nearest_candidates(df, "v", "vec_id", cents, n_cand=2)
    got = sorted(r["cluster"] for r in cand.collect())
    # exact-duplicate centroids: the two smallest cluster ids win
    assert got == [2, 5]


def test_kmeans_lloyd_arrow_matches_catalyst(spark):
    from farmrpg_etl_spark.queries import kmeans_lloyd

    rows = [
        (i, i % 4, [float((i * 7) % 13), float((i * 3) % 5), 0.25 * i])
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cluster long, v array<double>"
    ).select("vec_id", "cluster", V.as_double(F.col("v")).alias("v"))
    a = sorted(map(tuple, kmeans_lloyd(df, 3, impl="arrow").collect()))
    c = sorted(map(tuple, kmeans_lloyd(df, 3, impl="catalyst").collect()))
    assert a == c
    assert len(a) == 80
