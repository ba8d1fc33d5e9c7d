"""Skew mitigation: two-phase salted aggregation.

Spark's hash aggregation already does map-side partial aggregation, which
handles most skew for algebraic aggregates; AQE splits skewed JOIN
partitions. The remaining hard case is a hot GROUP BY key whose partial
states are still too large for one reducer (huge collect_set / exact
distinct states). `salted_agg` makes the classic fix explicit: append a
random-but-deterministic salt to the key, aggregate (key, salt) — spreading
each hot key over `salt_buckets` reducers — then re-aggregate by key.

Correct only for algebraic/decomposable aggregates: the caller supplies the
partial and final expression lists (e.g. partial count -> final sum).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    *,
    partial: Sequence[Column],
    final: Sequence[Column],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """groupBy(keys) in two shuffles, neither of which concentrates a hot
    key on one task. `salt_on` picks a deterministic salting column (so the
    operator stays replay-stable); defaults to a hash of all input columns.
    """
    keys = list(keys)
    if "__salt" in df.columns:
        raise ValueError("input already has a '__salt' column")
    salt_src = (
        F.col(salt_on)
        if salt_on is not None
        else F.hash(*[F.col(c) for c in df.columns])
    )
    salted = df.withColumn(
        "__salt", F.pmod(salt_src, F.lit(salt_buckets)).cast("int")
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(*partial)
    return stage1.groupBy(*keys).agg(*final)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where a hot key on `left` would overload one reducer:
    spread each left key over `salt_buckets` sub-partitions with a
    deterministic row-level salt, replicate `right` across every salt
    value (a `salt_buckets`-way fan-out of the SMALLER side only), and
    join on (keys, salt).

    When to use: AQE's skew-join split already covers most shuffle-join
    skew at runtime — reach for explicit salting only where AQE can't act
    (a skewed key feeding a window/groupBy downstream of the join, forced
    sort-merge plans, or engines/modes without AQE). `right` must be the
    smaller side (it is replicated); if it broadcasts, just broadcast it.

    Multiplicity is preserved for `inner` and `left` joins: each left row
    carries exactly one salt value and every right row exists at every
    salt, so each (left row, right row) key match pairs exactly once.

    The salt is PER ROW, not per row-content: a content hash alone would
    send fully identical rows (the common skew shape — hot key, low
    payload cardinality) to one bucket, defeating the mitigation exactly
    when it is needed. Mixing in `monotonically_increasing_id()` (partition
    ordinal + per-partition row counter) spreads duplicates round-robin
    across the buckets; the salt only shapes the shuffle, never the result,
    so it does not need to be replay-stable.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("input already has a '__salt' column")
    keys = list(keys)
    salted_left = left.withColumn(
        "__salt",
        F.pmod(
            F.hash(*[F.col(c) for c in left.columns])
            + F.monotonically_increasing_id(),
            F.lit(salt_buckets),
        ).cast("int"),
    )
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_left.join(salted_right, [*keys, "__salt"], how).drop("__salt")
