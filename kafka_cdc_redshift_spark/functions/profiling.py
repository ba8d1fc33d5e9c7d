"""Table profiling: per-column data-quality stats in ONE scan.

The pre-ingest sanity pass every pipeline runs before trusting a new
table drop: row count, null count, exact distinct count per column.

Scale design: a single aggregation over the table computes every
column's stats together (one scan, one combinable shuffle per distinct
aggregate — Spark expands N count_distincts via EXPAND, still one pass
over the input); the 1-row wide result is then unpivoted DRIVER-FREE
with stack() into the (column, stat...) long form. Exact distinct
counts are the verifiable contract here — the sketch-based cheap
variant at corpus scale is approx_count_distinct (see the
events_approx_distinct catalog entry, rows-only checked by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column (column, n_rows, n_null, n_distinct) over one scan.

    `n_distinct` counts non-null distinct values (count(DISTINCT c)
    semantics in every engine).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__dist_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct")
