"""Distributed moving-window aggregation for LOW-CARDINALITY series.

`sum(x) OVER (PARTITION BY series ORDER BY ts ROWS BETWEEN p PRECEDING
AND CURRENT ROW)` is the one window shape the engine's other scale
fixes don't cover: when `series` is low-cardinality (a handful of
sensors / event types) the window funnels each series' ENTIRE history
through one reducer — and unlike rank cuts (WindowGroupLimit) or rank
assignments (util.range_partitioned_rank), a running frame needs its
p predecessors physically present, so ranks alone don't decompose it.

The classic fix is block-partition-with-halo, the same overlap trick
stencil computations use:

  1. exact global rank per (series, order key) via
     util.range_partitioned_rank — no per-series sort;
  2. assign each row to rank block b = (rnk-1) DIV B, and COPY the
     last p rows of every block into block b+1 (the halo — p is tiny,
     so the duplication is p/B, well under 1%);
  3. run the frame window within (series, block) — fine-grained keys,
     each task sorts <= B + p rows — where every NATIVE row sees its
     full p predecessors (they are natives or halo copies);
  4. keep native rows only (halo copies computed partial frames at
     block starts and are dropped).

Row-for-row equal to the single-window spelling — frames are defined
by the same total order and every frame is fully populated — so the
SQL oracle keeps the window spelling and the engine never pays the
per-series reducer. Works for any frame aggregate over ROWS BETWEEN
p PRECEDING AND CURRENT ROW.

No reference analog: the reference pipeline (cdc_util/redshift_sink.py)
moves rows; time-series resampling is engine-native surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import range_partitioned_rank, stamp_range_bucket

#: default rank-block size: halo duplication is preceding/B (<0.1% at
#: p<=64), and B+p rows per window task keeps every sort cache-sized
DEFAULT_BLOCK = 65536


def moving_window_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    aggs: dict[str, Column],
    *,
    preceding: int,
    block: int = DEFAULT_BLOCK,
) -> DataFrame:
    """Moving-frame aggregates (ROWS BETWEEN `preceding` PRECEDING AND
    CURRENT ROW) over each `part_cols` series ordered by `order_cols`,
    computed block-partitioned with a p-row halo — exact, with no
    per-series single-reducer sort. `aggs` maps output column name to
    an aggregate Column (built from F.* over the input columns); each
    is evaluated over the frame. Output: the input columns plus the
    aggregate columns, one row per input row.

    `preceding` must be < `block` (the halo is one block deep)."""
    p = int(preceding)
    b = int(block)
    if p < 0:
        raise ValueError("preceding must be >= 0")
    if p >= b:
        raise ValueError("preceding must be < block (halo is one block)")
    ranked = range_partitioned_rank(
        df, list(part_cols), list(order_cols),
        rank_col="__rnk", n_col="__n",
    ).drop("__n")
    native = F.floor((F.col("__rnk") - F.lit(1)) / F.lit(b)).cast("long")
    targets = [native]
    if p > 0:
        targets.append(
            F.when(
                (F.col("__rnk") - F.lit(1)) % F.lit(b) >= F.lit(b - p),
                native + F.lit(1),
            )
        )
    blocks = ranked.select(
        "*",
        native.alias("__native"),
        F.explode(F.array_compact(F.array(*targets))).alias("__blk"),
    )
    w = (
        Window.partitionBy(*part_cols, "__blk")
        .orderBy("__rnk")
        .rowsBetween(-p, Window.currentRow)
    )
    out = blocks.select(
        "*", *[expr.over(w).alias(name) for name, expr in aggs.items()]
    )
    return (
        out.filter(F.col("__blk") == F.col("__native"))
        .drop("__blk", "__native", "__rnk")
    )


def running_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    *,
    sums: dict[str, Column | str] | None = None,
    lasts: dict[str, Column | str] | None = None,
    n_partitions: int | None = None,
    allow_double_sums: bool = False,
) -> DataFrame:
    """Running (UNBOUNDED PRECEDING .. CURRENT ROW) aggregates over each
    `part_cols` series ordered by `order_cols`, computed as a two-pass
    block prefix scan — exact, with no per-series single-reducer sort.
    This is the last window family the engine's other scale spellings
    don't cover: rank cuts get WindowGroupLimit, rank assignments get
    util.range_partitioned_rank, bounded ROWS frames get
    moving_window_agg — a running frame needs every predecessor's
    CONTRIBUTION, which (unlike the rows themselves) folds into one
    per-block partial:

      1. stamp each row's range bucket from sampled key boundaries
         (util.stamp_range_bucket — deterministic expression of the
         row, so every consumer sees the same partitioning);
      2. a tiny (buckets x series)-row census holds each block's
         partial (sum, or last non-null by order); a window over the
         CENSUS turns them into exclusive per-block prefixes,
         broadcast back (null-safe join);
      3. within each (bucket, series) a fine-grained window computes
         the intra-block running value; combined with the block prefix:
         running sum = prefix + intra, running last = coalesce(intra,
         prefix).

    `sums` maps output name -> numeric column (SQL SUM null semantics:
    null until the first non-null), `lasts` maps output name -> column
    carried forward last-non-null (LOCF / last_value IGNORE NULLS).
    Like any partial aggregation, a DOUBLE running sum is reassociated
    (block partial + intra sum), so it can differ from the sequential
    window fold in the last ulp — use decimal or integer types where
    bit-exact window parity matters; `lasts` is always exact. Because
    that drift is silent, a float/double `sums` column RAISES unless
    `allow_double_sums=True` explicitly accepts the reassociation
    (r9 verdict item #7 — no catalog query uses a double sums leg).
    The order key must be a total order for deterministic output (ties
    stay within one bucket, but tie order inside the window is
    arbitrary — same contract as the single-window spelling). Output:
    the input columns plus one column per entry.
    """
    sums = {
        k: (F.col(v) if isinstance(v, str) else v)
        for k, v in (sums or {}).items()
    }
    lasts = {
        k: (F.col(v) if isinstance(v, str) else v)
        for k, v in (lasts or {}).items()
    }
    if not sums and not lasts:
        raise ValueError("running_agg: need at least one of sums/lasts")
    if sums and not allow_double_sums:
        from pyspark.sql.types import DoubleType, FloatType

        kinds = {
            name: df.select(c.alias("__probe")).schema[0].dataType
            for name, c in sums.items()
        }
        floaty = [
            n for n, t in kinds.items()
            if isinstance(t, (DoubleType, FloatType))
        ]
        if floaty:
            raise ValueError(
                f"running_agg: sums column(s) {floaty} are float/double — "
                "the block prefix scan reassociates partial sums, so the "
                "result can differ from the sequential window fold in the "
                "last ulp. Cast to decimal/integer for bit-exact running "
                "sums, or pass allow_double_sums=True to accept the "
                "reassociation"
            )
    part_cols = list(part_cols)
    order_cols = list(order_cols)
    part = stamp_range_bucket(
        df, [*part_cols, *order_cols], n_partitions
    )
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    partials = [
        F.sum(c).alias(f"__ps_{name}") for name, c in sums.items()
    ] + [
        # last non-null by order within the block: max_by skips rows
        # whose ordering expression is null, so nulling the order out
        # for null values makes it "max_by over the non-null rows"
        F.max_by(c, F.when(c.isNotNull(), ord_struct)).alias(f"__pl_{name}")
        for name, c in lasts.items()
    ]
    census = part.groupBy("__pid", *part_cols).agg(*partials)
    w_prev = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.sum(f"__ps_{name}").over(w_prev).alias(f"__off_{name}")
        for name in sums
    ] + [
        F.last(f"__pl_{name}", ignorenulls=True).over(w_prev)
        .alias(f"__loff_{name}")
        for name in lasts
    ]
    offsets = census.select("__pid", *part_cols, *off_cols).select(
        F.col("__pid").alias("__opid"),
        *[F.col(c).alias(f"__ok{i}") for i, c in enumerate(part_cols)],
        *[F.col(f"__off_{name}") for name in sums],
        *[F.col(f"__loff_{name}") for name in lasts],
    )
    cond = F.col("__pid") == F.col("__opid")
    for i, c in enumerate(part_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__ok{i}"))
    w_run = (
        Window.partitionBy("__pid", *part_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part.join(F.broadcast(offsets), cond)
    for name, c in sums.items():
        intra = F.sum(c).over(w_run)
        off = F.col(f"__off_{name}")
        out = out.withColumn(
            name,
            F.when(
                intra.isNull() & off.isNull(), F.lit(None)
            ).otherwise(F.coalesce(intra, F.lit(0)) + F.coalesce(off, F.lit(0))),
        )
    for name, c in lasts.items():
        intra = F.last(c, ignorenulls=True).over(w_run)
        out = out.withColumn(name, F.coalesce(intra, F.col(f"__loff_{name}")))
    return out.drop(
        "__pid", "__opid",
        *[f"__ok{i}" for i in range(len(part_cols))],
        *[f"__off_{name}" for name in sums],
        *[f"__loff_{name}" for name in lasts],
    )
