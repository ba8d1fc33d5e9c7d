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


# ---------------------------------------------------------------------------
# Mergeable quantile sketches
#
# Quantiles are the other census column plain algebraic parts cannot carry
# (a median does not add). The scale answer mirrors the NDV sketch: a
# MERGEABLE log-scale histogram — per group, counts over exponential value
# buckets (`bits_per_octave` sub-buckets per power of two, so bucket width
# is a fixed RELATIVE error of 2^(1/B) ≈ 9% at B=8). Bucket counts add, so
# the standing (group, sketch) table folds a batch in O(|groups|+|batch|),
# any batching converges to the one-shot sketch (associative+commutative;
# property-tested), and the read-time estimate is deterministic — unlike
# approx_percentile's order-sensitive internal sketch, every op here is
# exact integer counting plus IEEE doubles, so a DuckDB oracle replays it
# bit-for-bit (the same trick the engine's other incremental columns use).
# Merging is NOT idempotent (counts add), so the streaming loop guards it
# with the batch-id pointer like group_stats.
# ---------------------------------------------------------------------------

QSK_BITS_PER_OCTAVE = 8  # 2^(1/8) ≈ 1.090 relative bucket width
_QSK_OFFSET = 1 << 20  # keeps sign*(offset+m) monotone in the value
_QSK_EPS = 1e-9  # |x| below this collapses to the zero bucket
#: 2^(j/8) for j = 0..7, precomputed HERE so both engines multiply the
#: same literal doubles (cross-libm pow(2, frac) is not trusted to agree
#: to the last bit; pow with INTEGER exponents is)
QSK_POW2_FRAC = tuple(2.0 ** (j / QSK_BITS_PER_OCTAVE)
                      for j in range(QSK_BITS_PER_OCTAVE))


def _qsk_bucket(value_col: str):
    """Sign-aware log2 bucket id, monotone in the value: negative values
    map to negative ids (more negative = larger magnitude), |x| < eps to
    bucket 0, positives to sign*(OFFSET + floor(log2|x| * B))."""
    x = F.col(value_col).cast("double")
    b = QSK_BITS_PER_OCTAVE
    m = F.floor(F.log2(F.abs(x)) * F.lit(float(b))).cast("int")
    return (
        F.when(F.abs(x) < F.lit(_QSK_EPS), F.lit(0))
        .otherwise(
            F.signum(x).cast("int") * (F.lit(_QSK_OFFSET) + m)
        )
    )


def group_quantile_sketch(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group quantile sketch of `value_col`: (keys..., qsketch
    array<struct<b,n>> sorted by bucket). One combinable shuffle; sketch
    size is O(occupied buckets) per group — bounded by the value range's
    octave span times 8, regardless of group cardinality."""
    return (
        df.select(*keys, _qsk_bucket(value_col).alias("b"))
        .groupBy(*keys, "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("b", "n"))
            ).alias("qsketch")
        )
    )


def merge_quantile_sketches(
    prev: DataFrame | None, batch_sketch: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a batch's sketch table into the standing one: per-bucket count
    addition (associative + commutative — any batch arrival order
    converges to the one-shot sketch; property-tested). NOT idempotent:
    callers under at-least-once delivery need the batch-id guard, exactly
    like merge_group_stats. Cost: explode to (group, bucket) rows — a few
    dozen per group — one combinable shuffle, re-collect."""
    if prev is None:
        return batch_sketch
    u = prev.unionByName(batch_sketch)
    return (
        u.select(*keys, F.explode("qsketch").alias("e"))
        .groupBy(*keys, F.col("e.b").alias("b"))
        .agg(F.sum("e.n").alias("n"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("b", "n"))
            ).alias("qsketch")
        )
    )


def estimate_quantiles(
    sketches: DataFrame, keys: Sequence[str], probs: Sequence[float]
) -> DataFrame:
    """Read-time quantile estimates from the stored sketches: for each
    prob p, the first bucket whose cumulative count reaches
    max(ceil(p*n), 1), and that bucket's lower-bound value as the
    estimate (relative error <= one bucket width, 2^(1/8)-1 ≈ 9%).
    Every op is exact integer counting + IEEE doubles over literals, so
    the estimate replays bit-for-bit in the SQL oracle. Output:
    (keys..., p, bucket, est, n_total)."""
    from pyspark.sql import Window

    b = QSK_BITS_PER_OCTAVE
    ex = sketches.select(*keys, F.explode("qsketch").alias("e")).select(
        *keys, F.col("e.b").alias("b"), F.col("e.n").alias("n")
    )
    w = Window.partitionBy(*keys).orderBy("b")
    cum = ex.withColumn("cum", F.sum("n").over(w)).withColumn(
        "tot", F.sum("n").over(Window.partitionBy(*keys))
    )
    pl = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    hit = cum.select(*keys, "b", "cum", "tot", pl).filter(
        F.col("cum")
        >= F.greatest(F.ceil(F.col("p") * F.col("tot")).cast("long"), F.lit(1))
    )
    sel = hit.groupBy(*keys, "p").agg(
        F.min("b").alias("bucket"), F.first("tot").alias("n_total")
    )
    sign = F.when(F.col("bucket") < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    m = F.abs(F.col("bucket")) - F.lit(_QSK_OFFSET)
    ip = F.floor(m.cast("double") / F.lit(float(b))).cast("int")
    j = (m - F.lit(b) * ip).cast("int")
    frac = F.element_at(
        F.array(*[F.lit(v) for v in QSK_POW2_FRAC]), j + 1
    )
    est = F.when(F.col("bucket") == 0, F.lit(0.0)).otherwise(
        sign * F.pow(F.lit(2.0), ip.cast("double")) * frac
    )
    return sel.select(*keys, "p", "bucket", est.alias("est"), "n_total")
