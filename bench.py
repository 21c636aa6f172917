"""Headline benchmark — one JSON line for the driver.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is executed to completion with the ``noop`` batch sink —
it materializes every output column (a bare ``count()`` would let
Catalyst prune computed columns and under-measure) without paying
driver-side collection.

Methodology: each query runs twice; the reported per-query time is the
second (steady-state) run. The first invocation of a query pays
one-time whole-stage-codegen compilation + JVM JIT warm-up, which on a
long-lived cluster amortizes to noise but at sf0.1 can exceed the
actual execution time 5×. The cold first-run total is still reported
(``cold_total_sec``) so regressions in compile cost stay visible.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: relational core + reference ops + LLM-pipeline ops
HEADLINE = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "regional_revenue",
    "top_customers_per_nation",
    "a1_latest_event_per_user_agg",
    "d1_changes_events",
    "exact_dedup_docs",
    "minhash_lsh_pairs_docs",
    "text_metrics_docs",
    "ann_topk_bruteforce",
    "asof_click_attribution",
    "tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from farmrpg_etl_spark.queries import QUERIES
    from farmrpg_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warm the JVM + parquet footers with a trivial action
    run("j3_fk_hydrate")

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        run(name)  # cold: pays codegen compile + JIT
        cold[name] = round(time.time() - t0, 3)
        steady = []
        for _ in range(2):  # min-of-2 shields against host noise spikes
            t0 = time.time()
            run(name)
            steady.append(time.time() - t0)
        times[name] = round(min(steady), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cold_total_sec": round(sum(cold.values()), 3),
    }

    # round-2 operator additions, timed the same way but reported
    # separately so the headline total stays comparable across rounds
    extended = {}
    for name in [
        "q19_disjunctive_revenue",
        "q21_waiting_suppliers",
        "decontaminate_docs",
        "repetition_docs",
        "pack_sequences_docs",
        "hourly_rollup_events",
        "ngram_jaccard_docs",
        "simhash_docs",
        "chunk_dedup_docs",
        "token_budget_mixture_docs",
        "ann_topk_quantized",
        "training_data_pipeline",
        "semantic_dedup_embeddings",
        "fuzzy_decontaminate_docs",
        "histogram_quantile_events",
    ]:
        run(name)
        steady = []
        for _ in range(2):
            t0 = time.time()
            run(name)
            steady.append(time.time() - t0)
        extended[name] = round(min(steady), 3)
    out["extended_queries"] = extended
    out["extended_total_sec"] = round(sum(extended.values()), 3)

    # reference-throughput comparison: the reference sustains ≤700 chat
    # msg-parses/s (BASELINE.md); measure our parse stage on the same
    # 100-message golden payload when available
    fixture = os.environ.get(
        "REFERENCE_CHAT_FIXTURE",
        "/root/reference/test/scrapers/fixtures/chat_help.html",
    )
    if os.path.exists(fixture):
        from datetime import datetime

        from farmrpg_etl_spark.parse.stage import parse_payloads, parsed_rows

        with open(fixture, "rb") as f:
            body = f.read()
        t0 = datetime(2022, 4, 17, 23, 59, 59)
        rows = [("chat", f"r{i}", t0, 200, body) for i in range(700)]
        pdf = spark.createDataFrame(
            rows, "source string, key string, fetch_ts timestamp, status int, body binary"
        ).repartition(32)
        parsed_rows(parse_payloads(pdf, "chat")).count()  # warm
        t1 = time.time()
        n = parsed_rows(parse_payloads(pdf, "chat")).count()
        out["parse_msgs_per_sec"] = round(n / (time.time() - t1))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
