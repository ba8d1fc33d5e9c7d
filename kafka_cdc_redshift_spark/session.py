"""SparkSession factory tuned for this engine.

Local test profile mirrors a multi-executor cluster via partitioning: AQE on
(runtime coalesce + skew-join splitting), UTC session timezone (CDC event
times are epoch-based), Arrow enabled for the pandas-UDF paths.

At 100 TB the same settings hold; only `shuffle.partitions` scales with the
cluster (rule of thumb: 2-3x total cores, AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "kafka_cdc_redshift_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    # Fixed, pre-touched heap. With a large -Xmx and a small initial heap,
    # G1 grows the committed heap in multi-GiB steps during allocation-heavy
    # (JSON parse) queries; 32 task threads then page-fault fresh kernel
    # pages concurrently, and the resulting kernel storm (observed: 90-98%
    # system CPU for 10-50 s, zero GC pauses over 205 ms) serializes the
    # whole JVM. That was BENCH_r01's "cdc_pipeline_dms 50 s" pathology —
    # deterministic bench ordering made the expansion always land on the
    # same query. -Xms == -Xmx + AlwaysPreTouch commits every heap page once
    # at startup (~1-2 s) and removes the stalls entirely (12/12 stable runs).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")
    jvm_opts = f"-Xms{driver_mem} -XX:+AlwaysPreTouch"
    if extra_conf and "spark.driver.extraJavaOptions" in extra_conf:
        extra_conf = dict(extra_conf)
        jvm_opts = f"{jvm_opts} {extra_conf.pop('spark.driver.extraJavaOptions')}"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan-split sizing: Spark splits files at
        # min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism)).
        # The 4 MB openCost default floors small-table scans at ~3 tasks on
        # a 32-core host (a 10 MB compressed fact scanned by 3 tasks is 29
        # idle cores; measured q1 3.3 s -> 1.3 s with the floor lowered).
        # 256 KB still amortizes file-open overhead but lets the
        # totalBytes/parallelism term win, so SMALL inputs fan out to the
        # cluster while big data keeps full 128 MB splits — the term that
        # governs at 100 TB is maxPartitionBytes, which stays default.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); Spark reads it as long ns
        # (converted back to µs NTZ in sources.files.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
