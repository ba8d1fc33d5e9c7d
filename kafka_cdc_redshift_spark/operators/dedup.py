"""Last-write-wins dedup — the engine's central reduction (SURVEY §2.5).

Reference semantics (cdc_util/redshift_sink.py:193-211): within one
micro-batch, keep at most one row per primary key — the one with the highest
event time; Canal tiebreaks by position inside the exploded `data` array
(:206-209).

Scale notes:
  * `row_number` over Window(partitionBy pk) is a single hash shuffle on the
    key — the minimum possible for this semantics. AQE splits skewed keys.
  * We add deterministic tiebreaks (caller-supplied, e.g. a unique id) so the
    winner is stable under any partitioning — required for exactly-once
    replay (T7) and for oracle comparison.
  * The reference re-dedups a second time inside Redshift staging
    (ROW_NUMBER ... :474-476) because COPY appends; in-engine a single pass
    suffices — merge_changes() consumes the already-unique output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c).desc() if isinstance(c, str) else c for c in order_by]


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column] = ("ts_ms",),
) -> DataFrame:
    """Keep the last write per key. `order_by` strings mean DESC on that
    column (highest wins); pass Column expressions for custom direction."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
    return (
        df.withColumn("seqnum_aws", F.row_number().over(w))
        .filter(F.col("seqnum_aws") == 1)
        .drop("seqnum_aws")
    )


def latest_deletes(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column] = ("ts_ms",),
    *,
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Last delete image per key (save_delete / only_save_delete modes,
    cdc_util/redshift_sink.py:213-227): pre-filter to deletes, then LWW."""
    return lww_dedup(df.filter(F.col(op_col) == delete_op), keys, order_by)
