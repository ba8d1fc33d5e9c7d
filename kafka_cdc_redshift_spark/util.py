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


def _sampled_range_bounds(
    df: DataFrame,
    keys: list[str],
    n_partitions: int,
    *,
    sample_per_partition: int = 20,
) -> list[tuple]:
    """Sample the key space ONCE and return up to n_partitions-1 boundary
    tuples, used as LITERALS by every downstream consumer — determinism
    by construction, with no materialization barrier. The sample is a
    distributed top-S by key hash (TakeOrdered: per-partition top-S +
    driver merge, never a full sort), so cost is one column-pruned scan
    and S ~ P*20 driver rows. Tuples containing NULL are excluded: a
    NULL field makes the struct comparison NULL (bucketing the row into
    partition 0), so NULL-keyed boundaries would bucket inconsistently
    with the NULLS FIRST order the rank replays."""
    from pyspark.sql import functions as F

    if n_partitions <= 1:
        return []
    s = max(n_partitions * sample_per_partition, 64)
    sampled = (
        df.select(*keys)
        .na.drop("any")
        .orderBy(F.xxhash64(*keys))
        .limit(s)
        .collect()
    )
    vals = sorted({tuple(r) for r in sampled})
    if not vals:
        return []
    step = len(vals) / n_partitions
    bounds: list[tuple] = []
    for i in range(1, n_partitions):
        b = vals[min(int(i * step), len(vals) - 1)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def stamp_range_bucket(
    df: DataFrame,
    keys: list[str],
    n_partitions: int | None = None,
    *,
    pid_col: str = "__pid",
) -> DataFrame:
    """Stamp each row's range-bucket id: the count of sampled boundary
    tuples (see `_sampled_range_bounds`) strictly below the row's key,
    as a deterministic EXPRESSION of the row — so any number of
    downstream consumers (censuses, windows) observe the identical
    partitioning with no materialization barrier. Bucket ids are
    monotone in the key's lexicographic order; rows with a NULL key
    field land in bucket 0, matching their NULLS FIRST sort position.
    The shared substrate of `range_partitioned_rank` and
    `functions.timeseries.running_agg`.

    The stamp is a BALANCED comparison tree over the sorted boundary
    literals, not a linear when-chain: `when` short-circuits, so each
    row evaluates one root-to-leaf path — O(log P) struct comparisons
    per row — instead of all P-1. At the default P≈32 the difference is
    noise; at a 100 TB shuffle width (P in the thousands) a linear
    stamp's per-row cost grows with the cluster, a logarithmic one
    doesn't. Monotonicity of `key > bound` over sorted distinct bounds
    makes the binary descent exact (bucket id = count of bounds below
    the key, same value the linear sum computed); a NULL key field
    makes every comparison NULL, so the descent takes the otherwise
    branch at each node and lands in bucket 0 — the NULLS FIRST
    position the consumers' sort order expects."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    bounds = _sampled_range_bounds(df, keys, n_partitions)
    key_struct = F.struct(*[F.col(c) for c in keys])
    types = {c: df.schema[c].dataType for c in keys}

    def blit(b: tuple):
        return F.struct(
            *[F.lit(v).cast(types[c]) for c, v in zip(keys, b)]
        )

    def descend(lo: int, hi: int):
        # bucket id known to lie in [lo, hi]; bounds[i] is the open
        # lower edge of bucket i+1
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            key_struct > blit(bounds[mid]), descend(mid + 1, hi)
        ).otherwise(descend(lo, mid))

    return df.withColumn(pid_col, descend(0, len(bounds)))


def range_partitioned_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    *,
    n_partitions: int | None = None,
    rank_col: str = "rnk",
    n_col: str = "n",
) -> DataFrame:
    """Exact per-group dense rank WITHOUT a per-group single-reducer
    sort — the scale-safe replacement for
    `row_number() OVER (PARTITION BY low_cardinality_key ORDER BY ...)`:

      1. sample the FULL key (part_cols + order_cols) once and stamp
         each row's range-bucket id `__pid` from EXPLICIT boundary
         literals (struct comparisons) — each group spreads across many
         buckets, in key order, and the bucket id is a deterministic
         function of the ROW, so every consumer observes the identical
         partitioning with no materialization barrier (the old
         spark_partition_id + localCheckpoint spelling materialized the
         whole corpus to executor storage just to pin the sampler);
      2. a tiny (buckets x groups)-row census gives every (pid, group)
         slice its global offset and each group its total `n_col` —
         both via windows over the CENSUS, broadcast back (null-safe
         join: NULL group keys form a normal window partition);
      3. per-row `rank_col` = offset + row_number within (pid, group) —
         a fine-grained window key, each task sorts ~n/P rows.

    Rank exactness does not depend on where the sampled boundaries land
    (they only move rows between tasks), so the result is deterministic
    and equals the single-window spelling row-for-row. Rows with a NULL
    key field land in bucket 0, matching their NULLS FIRST rank order.
    The order key must be a total order (append a unique id as the last
    order column). Output: df's columns + rank_col + n_col, with the
    internal pid/offset columns dropped.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    part = stamp_range_bucket(
        df, [*part_cols, *order_cols], n_partitions
    )
    census = part.groupBy("__pid", *part_cols).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy(*part_cols)
    offsets = census.select(
        "__pid",
        *part_cols,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_n).alias(n_col),
    ).select(
        F.col("__pid").alias("__opid"),
        *[F.col(c).alias(f"__ok{i}") for i, c in enumerate(part_cols)],
        "__off",
        n_col,
    )
    cond = F.col("__pid") == F.col("__opid")
    for i, c in enumerate(part_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__ok{i}"))
    w_rank = Window.partitionBy("__pid", *part_cols).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    return (
        part.withColumn("__rn", F.row_number().over(w_rank))
        .join(F.broadcast(offsets), cond)
        .withColumn(rank_col, F.col("__off") + F.col("__rn"))
        .drop(
            "__pid", "__rn", "__off", "__opid",
            *[f"__ok{i}" for i in range(len(part_cols))],
        )
    )


def closed_form_ntile(
    n_buckets: int, *, rank_col: str = "rnk", n_col: str = "n"
):
    """The SQL-standard ntile bucket computed map-side from an exact
    (rank, group size) pair — the companion to `range_partitioned_rank`
    that lets `ntile(k) OVER (PARTITION BY low_cardinality_key ...)` be
    replaced without a per-group sort: the first n % k buckets take
    ceil(n/k) rows, the rest floor(n/k), in pure integer `DIV`
    arithmetic so no float rounding can move a boundary. When n < k the
    remainder branch covers every rank (cut == n), so the base==0
    division is never selected."""
    from pyspark.sql import functions as F

    k = int(n_buckets)
    r, n = rank_col, n_col
    return F.expr(
        f"CAST(CASE WHEN {r} <= ({n} % {k}) * (({n} DIV {k}) + 1)"
        f" THEN ({r} - 1) DIV (({n} DIV {k}) + 1) + 1"
        f" ELSE ({n} % {k}) + ({r} - ({n} % {k}) * (({n} DIV {k}) + 1) - 1)"
        f" DIV ({n} DIV {k}) + 1 END AS INT)"
    )
