"""Scan-efficiency proofs on the real query surface: predicates must
reach the parquet scan (PushedFilters), projections must narrow the
read schema (ReadSchema), and whole-stage codegen must cover the hot
expressions. A scan that reads all columns for a two-column projection
is wrong at any scale; at 100 TB it is the difference between reading
2 columns' pages and the whole corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from farmrpg_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _filescan_lines(df) -> list[str]:
    return [l for l in _plan(df).splitlines() if "FileScan" in l]


def test_q6_filters_pushed_to_scan(spark):
    scans = _filescan_lines(QUERIES["q6_forecast_revenue"](spark, SF))
    li = next(s for s in scans if "lineitem" in s)
    pushed = li.split("PushedFilters:")[1].split("]")[0]
    # range predicates on shipdate/discount/quantity reach the reader
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_q6_reads_only_needed_columns(spark):
    scans = _filescan_lines(QUERIES["q6_forecast_revenue"](spark, SF))
    li = next(s for s in scans if "lineitem" in s)
    schema = li.split("ReadSchema:")[1]
    # 4 of lineitem's 11 columns — never the full row
    for col in ("l_extendedprice", "l_discount", "l_shipdate", "l_quantity"):
        assert col in schema
    for col in ("l_comment", "l_returnflag", "l_partkey", "l_tax"):
        assert col not in schema


def test_flagship_scans_are_column_pruned(spark):
    scans = _filescan_lines(QUERIES["revenue_by_nation"](spark, SF))
    li = next(s for s in scans if "lineitem" in s)
    schema = li.split("ReadSchema:")[1]
    assert "l_extendedprice" in schema and "l_discount" in schema
    assert "l_quantity" not in schema and "l_shipdate" not in schema


def test_flagship_uses_whole_stage_codegen_and_broadcast(spark):
    df = QUERIES["revenue_by_nation"](spark, SF)
    df.collect()  # finalize the adaptive plan on this same Dataset
    plan = _plan(df)
    # '*(n)' prefixes mark operators inside whole-stage-codegen spans
    assert "isFinalPlan=true" in plan and "*(" in plan
    assert "BroadcastHashJoin" in plan  # nation/customer dims broadcast


def test_aqe_splits_skewed_join(spark):
    """A 90%-one-key join must trigger AQE's skew-join splitting
    (isSkew=true partitions) instead of one straggler task."""
    # Fact side: 99% of rows share key 1; dim side: one row per key, so
    # the join output stays |fact| while the key distribution is skewed.
    # The payload must be non-compressible AND survive column pruning
    # (consumed by the aggregate) — a constant-key-only shuffle
    # compresses to a few KB and no partition ever *looks* skewed.
    big = spark.range(0, 1_000_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.xxhash64(F.col("id")).alias("payload"),
    )
    dim = (
        spark.range(0, 1_000_000, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("p2"))
        .union(spark.sql("SELECT 1 AS k, -1 AS p2"))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = big.join(dim, "k").groupBy().agg(
            F.max("payload").alias("m"), F.count(F.lit(1)).alias("n")
        )
        [row] = agg.collect()  # collect() finalizes THIS Dataset's plan
        assert row.n == 1_000_000
        plan = _plan(agg)
        assert "skew=true" in plan
        assert "AQEShuffleRead" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_q19_disjunction_pushes_to_both_scans(spark):
    """Catalyst must derive each table's residue of the OR'd predicate
    groups and push it below the join — the difference between scanning
    three brand/size/quantity slices and scanning everything."""
    df = QUERIES["q19_disjunctive_revenue"](spark, SF)
    scans = _filescan_lines(df)
    li = next(s for s in scans if "lineitem" in s)
    p = next(s for s in scans if "/part.parquet" in s)
    assert "Or(" in li.split("PushedFilters:")[1]
    assert "l_quantity" in li.split("PushedFilters:")[1]
    assert "Or(" in p.split("PushedFilters:")[1]
    assert "p_brand" in p.split("PushedFilters:")[1]


def test_q21_semi_anti_never_duplicate(spark):
    """The EXISTS/NOT-EXISTS legs must stay semi/anti joins (row counts
    bounded by the base side) — a rewrite through inner join + distinct
    would explode multi-match orders at scale."""
    plan = _plan(QUERIES["q21_waiting_suppliers"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """The benchmark side must broadcast: at corpus scale the train
    side may never shuffle for this join."""
    plan = _plan(QUERIES["decontaminate_docs"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # exactly two hash exchanges: the eval-side distinct (dimension-
    # sized, feeds the broadcast) and the final per-doc count — the
    # train-side gram stream itself never hash-partitions for the join
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert re.search(r"Exchange hashpartitioning\(doc_id", plan)


def test_repetition_metrics_counts_are_shuffle_free(spark):
    """The distinct-count columns come from per-row array ops; only the
    modal-2-gram pipeline may shuffle: its two partial-aggregated
    groupBys plus the staged side of the join-back (the modal side
    reuses its groupBy partitioning) — 3 hash exchanges total, never
    one per metric."""
    import re

    from farmrpg_etl_spark.operators.quality import repetition_metrics

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = _plan(repetition_metrics(df, "text", "doc_id"))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-group pruning for selective non-broadcast joins:
    Spark builds a bloom filter from the filtered dimension-ish side
    and applies might_contain on the fact scan. At 100 TB the default
    thresholds (10 GB application-side scan) trigger this naturally;
    the test lowers them to demonstrate on test data."""
    from farmrpg_etl_spark.sources.tables import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = _plan(j)
        assert "bloom_filter_agg" in plan
        # and the result is unaffected by the runtime filter
        n = j.collect()
        assert sum(r["count"] for r in n) > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------- round-3 plan shapes
def test_heavy_hitters_plan_broadcasts_candidates(spark):
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.heavyhitters import heavy_hitters

    df = spark.createDataFrame([(f"t{i % 7}",) for i in range(100)], "item string")
    plan = (
        heavy_hitters(df, "item", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # pass 1 summary runs in Python map-side; candidates reach the scan
    # as a broadcast LeftSemi — never a full-vocabulary shuffle join
    assert "MapInPandas" in plan
    assert "LeftSemi, BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_guard_plan_broadcasts_stats(spark):
    from farmrpg_etl_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, "c", [float(i % 5), 1.0, 0.0, 0.0]) for i in range(40)],
        "vec_id int, cluster string, vec array<double>",
    )
    out = semantic_dedup(
        df, "vec", "vec_id", "cluster", 0.9,
        max_cluster_size=10, split_dim=4, split_planes=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # per-cluster stats (size + mean projections) join back as a
    # broadcast; the corpus never shuffles to compute its join key,
    # and the guarded self-join stays an equi hash join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------- round-4 plan shapes
def test_bm25_plan_broadcast_semi_and_window_group_limit(spark):
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"w{i % 9} common filler text") for i in range(200)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "w1 common"), (2, "w2 filler")],
        "query_id long, query_text string",
    )
    plan = (
        bm25_topk(docs, q, "text", "doc_id", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # query terms reach the corpus tokens as a broadcast semi-join —
    # the full vocabulary never shuffles
    assert "LeftSemi, BuildRight" in plan
    # per-query top-k is map-side limited before the final sort
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_dup_span_plan_no_cartesian_single_gram_shuffles(spark):
    from farmrpg_etl_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        duplicated_spans(df, "text", "doc_id", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # interval union is a window over hit positions keyed by doc
    assert "Window" in plan


def test_semantic_contamination_plan_broadcasts_eval(spark):
    from farmrpg_etl_spark.operators.similarity import semantic_contamination

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100, 150)],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    plan = (
        semantic_contamination(corpus, ev, "embedding", "vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the eval side broadcasts; the corpus is never exchanged
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange") == plan.count("BroadcastExchange")


def test_cut_dup_span_plan_no_cartesian_window_coverage(spark):
    """Span cutting: coverage must come from the dense-position window
    (rowsBetween), never a k-way fan-out band join; no cartesian; the
    hit join keys on the uniform (id, pos) pair."""
    from farmrpg_etl_spark.operators.dedup import cut_duplicated_spans

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan(cut_duplicated_spans(df, "text", "doc_id", k=3))
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_tuned_ivf_plan_broadcasts_probes_and_centroids(spark):
    """ann_recall_ivf_tuned's scale contract: centroids reach the
    corpus via broadcast (BroadcastNestedLoopJoin over the 10-row
    table), and the candidate join broadcasts the probe side as a
    BroadcastHashJoin on the cell id — the corpus itself is never
    shuffled for the index."""
    from farmrpg_etl_spark.queries import ann_recall_ivf_tuned

    df = ann_recall_ivf_tuned(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # centroid fan-out
    assert "BroadcastHashJoin" in plan        # probe-side candidate join
    assert "CartesianProduct" not in plan


def test_pq_rerank_plan_shape(spark):
    """The PQ retrieval plan's scale claims, asserted: the query side
    (dtables) and seed codebooks reach the corpus via broadcast
    exchanges, and no cartesian product appears anywhere (the
    crossJoin is broadcast-nested-loop over a 10-row side)."""
    import hashlib as h

    from farmrpg_etl_spark.operators.similarity import pq_adc_rerank_topk

    rows = [
        (i, [int(h.md5(f"{i}|{j}".encode()).hexdigest()[:4], 16) / 65536.0 - 0.5
             for j in range(8)])
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter("vec_id < 3")
    out = pq_adc_rerank_topk(df, q, "v", "vec_id", k=3, dim=8, m=2, ks=4,
                             shortlist=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_hybrid_retrieval_plan_no_cartesian(spark, tmp_path):
    """Hybrid fusion: the dense side's query cross join must be a
    broadcast nested loop (queries are benchmark-sized), never a
    CartesianProduct, and the BM25 token reduction's semi-join
    broadcast survives into the fused plan."""
    from farmrpg_etl_spark.queries import QUERIES

    docs = [(i, f"u{i}a u{i}b common tokens here doc {i}") for i in range(100)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = QUERIES["hybrid_retrieval_docs"](spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert out.count() >= 0  # executes end-to-end on the tiny corpus
