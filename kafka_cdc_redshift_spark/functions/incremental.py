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
