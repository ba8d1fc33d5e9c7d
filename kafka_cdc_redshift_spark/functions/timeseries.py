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

from ..util import range_partitioned_rank

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
