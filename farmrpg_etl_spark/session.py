"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the configuration below is chosen
so the same code runs unchanged on a multi-executor cluster:

* AQE on (runtime shuffle coalescing, skew-join splitting),
* explicit shuffle parallelism (overridable by env),
* Arrow enabled for the few pandas-UDF code paths,
* UTC session timezone — the reference normalizes every timestamp to
  UTC (reference ``src/farmrpg_etl/utils/datetime.py:4-13``), we pin
  it engine-wide so timestamp semantics never depend on host tz.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "farmrpg-etl-spark") -> SparkSession:
    # Before the JVM starts: make google.protobuf importable (vendored
    # mini runtime) so transformWithStateInPandas workers can speak
    # the TWS state protocol in containers without protobuf.
    from farmrpg_etl_spark.vendor import enable_miniproto

    enable_miniproto()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan split size. 128m (the Spark default) is right when files
        # are ≥ hundreds of MB — at 100 TB the scan parallelism comes
        # from file count. Local sf0.1 testdata is single ~10 MB files,
        # which 128m reads as ~1 task on 32 cores; bench.py pins this
        # to 4m so scans fan out (a single-file 100 MB stretch corpus
        # at 128m ran the whole 10× dedup suite on ONE core).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores TIMESTAMP(NANOS); read as long + cast
        # (sources/tables.py normalizes) instead of PARQUET_TYPE_ILLEGAL
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
