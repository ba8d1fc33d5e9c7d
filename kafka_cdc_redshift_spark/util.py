"""Small engine utilities shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1, force: bool = False) -> DataFrame:
    """Ensure CPU-heavy downstream work runs at cluster parallelism.

    A small parquet file scans as ONE partition (`maxPartitionBytes`
    chunking), which serializes every expensive per-row projection behind it
    (shingling, md5, vector math) onto a single core while the rest of the
    cluster idles. At real scale inputs have plenty of splits and this is a
    no-op — the round-robin repartition only fires when the current partition
    count is below `defaultParallelism * factor`, so it never adds a shuffle
    to a well-partitioned 100 TB scan.

    `force=True` repartitions unconditionally — for inputs whose partition
    COUNT is fine but whose balance is not (e.g. a union of a few fat
    branches with many empty ones); use only where the extra shuffle is
    known-cheap, like fixture materialization.
    """
    spark = df.sparkSession
    # respect the session's declared parallelism intent (shuffle.partitions),
    # capped by actual cores — local test sessions run 8-way, bench 32-way
    target = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    ) * factor
    if force or _estimated_partitions(df) < target:
        return df.repartition(target)
    return df


def _estimated_partitions(df: DataFrame) -> float:
    """Scan-partition estimate from optimizer statistics, NOT `df.rdd`.

    `df.rdd.getNumPartitions()` forces full physical planning + RDD DAG
    construction on the driver at every operator head — double-planning
    large queries just to read one number. The optimized plan's
    sizeInBytes / maxPartitionBytes is the same signal for file scans
    (that ratio IS how the scan gets split) without building a physical
    plan. Falls back to the RDD probe on backends without a JVM handle."""
    try:
        jqe = df._jdf.queryExecution()
        raw = jqe.optimizedPlan().stats().sizeInBytes()
        size = int(raw.toString()) if hasattr(raw, "toString") else int(raw)
        max_pb = int(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)).rstrip("b")
        )
        return size / max(max_pb, 1)
    except Exception:  # noqa: BLE001 - connect/other backends
        return float(df.rdd.getNumPartitions())
