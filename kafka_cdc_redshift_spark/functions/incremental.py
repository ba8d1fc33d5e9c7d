"""Incremental (algebraic) aggregate maintenance for append-only feeds.

A 100 TB corpus census should never be recomputed from scratch because a
crawl batch landed: every aggregate kept here is ALGEBRAIC — counts and
sums add, min/max fold — so the standing stats table updates from a new
batch in O(|groups| + |batch|), reading the batch once and the corpus
never. This is the batch-analytics twin of the CDC pipeline's
incremental merge: `merge_changes` maintains latest STATE, this
maintains latest AGGREGATES.

Higher moments ride the same shape: variance/mean are DERIVED from the
mergeable triple (n, sum, sum of squares) at read time, never stored —
storing only algebraic parts is what keeps the merge exact. Sums over
integer columns stay integer (exact, engine-portable); derived ratios
are IEEE double ops over exact integers, deterministic across engines
(the same convention the oracle catalog relies on elsewhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns of a stats table for value column v: n, sum, sumsq, min, max
_PARTS = ("n", "sum", "sumsq", "min", "max")


def group_stats(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Mergeable per-group stats of `value_col`: (keys..., n, sum, sumsq,
    min, max). Integer-exact for integer inputs; one combinable shuffle."""
    v = F.col(value_col).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("sumsq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_group_stats(
    prev: DataFrame | None, batch_stats: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a batch's stats into the standing stats table algebraically:
    n/sum/sumsq add, min/max fold. `prev=None` bootstraps. Cost is one
    union + one combinable shuffle over |groups| rows — the corpus
    itself is never touched. Associative and commutative, so any batch
    arrival order converges to `group_stats` of the full data
    (property-tested)."""
    if prev is None:
        return batch_stats
    u = prev.unionByName(batch_stats)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum").alias("sum"),
        F.sum("sumsq").alias("sumsq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def derive_stats(stats: DataFrame) -> DataFrame:
    """Read-time derived metrics from the algebraic parts: mean and
    population variance. Double ops over exact integer parts — the same
    expression evaluated in any IEEE engine gives the same bits, so the
    derived columns stay oracle-checkable."""
    n = F.col("n").cast("double")
    s = F.col("sum").cast("double")
    ss = F.col("sumsq").cast("double")
    return stats.withColumn("mean", s / n).withColumn(
        "var_pop", (ss - (s * s) / n) / n
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches
#
# Distinct counts are the one census column the algebraic parts above cannot
# carry: |A ∪ B| ≠ |A| + |B|. The scale answer is a MERGEABLE sketch —
# HyperLogLog registers union by per-register max, which is associative,
# commutative, and idempotent, so a standing (group, sketch) table folds a
# new batch in O(|groups| + |batch|) exactly like merge_group_stats, and
# replayed rows cannot double-count (idempotence is what a plain counter
# can never give under at-least-once delivery). Spark's Datasketches-backed
# hll_* expressions keep the whole path JVM-native.
# ---------------------------------------------------------------------------

DEFAULT_LGK = 12  # 2^12 registers -> ~1.6% standard error, 2-3 KB/group


def group_distinct_sketch(
    df: DataFrame, keys: Sequence[str], value_col: str, *, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Per-group HLL sketch of `value_col`: (keys..., ndv_sketch binary).
    One combinable shuffle; sketch size is fixed (~2^lgk bytes) per group
    regardless of group cardinality."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("ndv_sketch")
    )


def merge_distinct_sketches(
    prev: DataFrame | None, batch_sketch: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a batch's sketch table into the standing one: per-group HLL
    union (register-wise max — associative/commutative/idempotent, so any
    batch arrival order converges to the one-shot sketch; property-
    tested). `prev=None` bootstraps. Cost: one union + one combinable
    shuffle over |groups| rows."""
    if prev is None:
        return batch_sketch
    u = prev.unionByName(batch_sketch)
    return u.groupBy(*keys).agg(
        F.hll_union_agg("ndv_sketch").alias("ndv_sketch")
    )


def estimate_distinct(sketches: DataFrame) -> DataFrame:
    """Read-time NDV estimate column from the stored sketches."""
    return sketches.withColumn(
        "ndv_est", F.hll_sketch_estimate("ndv_sketch")
    )
