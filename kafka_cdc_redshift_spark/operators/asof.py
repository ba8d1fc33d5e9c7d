"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key whose
time is <= the left row's time (backward as-of). The classic need in a
training-data pipeline: enrich an event with the state that was true WHEN
the event happened, never with future data (no label leakage).

Implementation is the distributed union+window trick, NOT a range join:
tag both sides, sort within each key by (time, right-first), and carry the
last-seen right payload forward with last_value(ignorenulls). Cost = ONE
hash shuffle on the key + a partition-local sort — the same shape as the
LWW dedup, so it scales exactly as far. A naive inequality join would be
O(|L|x|R|) per key and explode on hot keys.

DuckDB's native ASOF JOIN replays the same semantics in the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str | None = None,
    low_cardinality: bool = False,
) -> DataFrame:
    """Backward as-of join (left rows kept; unmatched get nulls).

    `on`       : equi-key column names present in BOTH sides
    left_time / right_time : event-time columns (comparable types)
    right_cols : right payload columns to attach (default: all non-key,
                 non-time columns)
    tolerance  : optional max lookback as an INTERVAL string (e.g.
                 '7 days') — matches older than left_time - tolerance are
                 discarded, like pandas.merge_asof(tolerance=...).
    suffix     : appended to any attached right column whose name collides
                 with a left column (like pandas.merge_asof suffixes);
                 None (default) raises on collision instead of emitting an
                 ambiguous duplicate name.
    low_cardinality : the union+window carry-forward partitions by `on`,
                 so a handful of hot keys funnels each key's full
                 timeline through one task. Pass True when `on` is
                 low-cardinality (a sensor id, an event type) to run the
                 carry through the two-pass block prefix scan
                 (functions.timeseries.running_agg) — identical output,
                 every sort task bounded by ~n/P rows. Leave False for
                 high-cardinality keys (the default plan is one shuffle
                 and already balanced).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_time}]
    right_cols = list(right_cols)
    clash = [c for c in right_cols if c in set(left.columns)]
    if clash:
        if suffix is None:
            raise ValueError(
                f"asof_join: right columns {clash} collide with left columns; "
                "pass suffix= to disambiguate or narrow right_cols"
            )
        out_names = [c + suffix if c in set(left.columns) else c for c in right_cols]
    else:
        out_names = right_cols

    l_tag = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in [right_time, *right_cols]])
                         .alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType
        ).alias("__l"),
        F.struct(F.col(right_time), *[F.col(c) for c in right_cols]).alias("__r"),
    )
    # right rows sort BEFORE left rows at equal time => ties match (<=)
    tagged = l_tag.unionByName(r_tag)
    if low_cardinality:
        from ..functions.timeseries import running_agg

        joined = running_agg(
            tagged, on, ["__t", "__is_left"], lasts={"__match": "__r"}
        ).filter(F.col("__is_left") == 1)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        joined = tagged.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(w)
        ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        too_old = F.col("__match").isNotNull() & (
            F.col(f"__match.{right_time}")
            < F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        )
        joined = joined.withColumn(
            "__match", F.when(too_old, F.lit(None)).otherwise(F.col("__match"))
        )
    out_left = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__match.{c}").alias(n) for c, n in zip(right_cols, out_names)
    ]
    return joined.select(*out_left, *out_right)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_time: str,
    right_start: str,
    right_end: str,
    granule: str = "7 days",
) -> DataFrame:
    """Interval join: left rows matched to every right row whose
    [right_start, right_end) interval contains left_time (inner join,
    plus the equi-keys `on`).

    A naive `l.t >= r.s AND l.t < r.e` theta-join degenerates to a per-key
    cross join (Spark can only hash on the equi part). Instead both sides
    are bucketed into fixed time granules: a right interval registers in
    every granule it overlaps (sequence+explode), a left row in exactly
    one, and the join becomes an equi-join on (keys..., granule) with the
    exact range predicate as a residual filter. Join fan-out per row is
    O(interval_length / granule), not O(|right per key|). Pick `granule`
    near the typical interval length.
    """
    on = list(on)
    g = F.expr(f"INTERVAL {granule}")
    # granule index = floor(epoch_seconds / granule_seconds); granule_seconds
    # derived as unix_timestamp(epoch + interval) so any INTERVAL string works

    def granule_of(c):
        return F.floor(
            F.unix_timestamp(F.col(c).cast("timestamp"))
            / F.unix_timestamp((F.lit("1970-01-01 00:00:00").cast("timestamp") + g))
        ).cast("long")

    l_g = left.withColumn("__g", granule_of(left_time))
    r_g = right.withColumn(
        "__g",
        F.explode(
            F.sequence(
                granule_of(right_start),
                # end is exclusive, but a row landing inside the end granule
                # still needs it registered
                granule_of(right_end),
            )
        ),
    )
    cond = (
        (F.col(left_time) >= F.col(right_start))
        & (F.col(left_time) < F.col(right_end))
    )
    return (
        l_g.join(r_g, on=[*on, "__g"])
        .filter(cond)
        .drop("__g")
    )
