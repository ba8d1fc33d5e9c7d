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
events_approx_distinct catalog entry, whose oracle checks the exact
count plus a Spark-computed error-bound flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column (column, n_rows, n_null, n_distinct) over one scan.

    `n_distinct` counts non-null distinct values (count(DISTINCT c)
    semantics in every engine).

    Built entirely from Column objects — raw column names are resolved
    via backtick-escaped exact references and emitted only as literals,
    never interpolated into an F.expr string, so names containing quotes,
    backticks, dots, or spaces profile like any other column.
    """

    def ref(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.struct(
                F.sum(ref(c).isNull().cast("long")).alias("n_null"),
                F.count_distinct(ref(c)).alias("n_distinct"),
            ).alias(f"__p{i}")
        )
    wide = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__p{i}").getField("n_null").alias("n_null"),
                    F.col(f"__p{i}").getField("n_distinct").alias("n_distinct"),
                )
                for i, c in enumerate(cols)
            ]
        )
    ).alias("__s")
    return wide.select(F.col("__n").alias("n_rows"), per_col).select(
        F.col("__s.column").alias("column"),
        "n_rows",
        F.col("__s.n_null").alias("n_null"),
        F.col("__s.n_distinct").alias("n_distinct"),
    )
