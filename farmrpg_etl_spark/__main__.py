"""Runnable service topology — the Spark analog of the reference's
``__main__`` wiring (reference src/farmrpg_etl/__main__.py:53-70).

One invocation executes a full cycle against a payload landing zone:

    python -m farmrpg_etl_spark --landing DIR --out DIR [--sweep]

* ``--sweep`` runs one poll sweep first (stub fetcher unless deployed
  with a real HTTP client) and lands payload rows;
* then the chat (E1), flags (E2), and user (E3) pipelines run over the
  landing zone with availableNow triggers — the same composition a
  long-running deployment executes with processing-time triggers at
  the reference's intervals (1 s chat / 30 s flags / 600 s online).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--landing", required=True, help="payload landing-zone dir")
    ap.add_argument("--out", required=True, help="sink tables root dir")
    ap.add_argument("--sweep", action="store_true", help="run one poll sweep first")
    args = ap.parse_args()

    from farmrpg_etl_spark.plans.topology import (
        chat_pipeline_streaming,
        flags_pipeline_streaming,
        user_pipeline_batch,
    )
    from farmrpg_etl_spark.session import get_spark
    from farmrpg_etl_spark.sinks.writers import ParquetTable
    from farmrpg_etl_spark.sources.landing import land_poll_sweep, read_landing

    spark = get_spark("farmrpg-etl-spark")
    spark.sparkContext.setLogLevel("WARN")

    if args.sweep:
        n = land_poll_sweep(spark, args.landing)
        print(f"landed {n} payload rows")

    messages = ParquetTable(spark, os.path.join(args.out, "messages"))
    chat_docs = ParquetTable(spark, os.path.join(args.out, "chat_docs"))
    users = ParquetTable(spark, os.path.join(args.out, "users"))
    snapshots = ParquetTable(spark, os.path.join(args.out, "user_snapshots"))

    if not os.path.isdir(args.landing) or not os.listdir(args.landing):
        print("landing zone empty; nothing to process")
        return

    q1 = chat_pipeline_streaming(spark, args.landing, messages, chat_docs)
    q1.awaitTermination()
    q2 = flags_pipeline_streaming(spark, args.landing, messages)
    q2.awaitTermination()
    payloads = read_landing(spark, args.landing)
    snaps = user_pipeline_batch(payloads, users, snapshots, batch_id=0)
    print(
        "cycle done:",
        f"messages={0 if messages.read() is None else messages.read().count()}",
        f"docs={0 if chat_docs.read() is None else chat_docs.read().count()}",
        f"snapshots={snaps.count()}",
    )


if __name__ == "__main__":
    main()
