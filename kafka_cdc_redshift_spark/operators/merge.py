"""Merge (upsert + delete) — in-engine replacement for the reference's
SQL-in-Redshift transaction (cdc_util/redshift_sink.py:477-509):

    begin;
      delete from target using stage where <pk equi-join>;   -- J2
      insert into target select ... from stage where op != delete;  -- J3
    end;

Net effect: target := (target MINUS all batch pks) UNION (surviving non-delete
rows). Expressed natively as a left-anti join + unionByName — Catalyst picks
the join strategy; the batch side is typically small relative to the target,
so we broadcast it when its plan allows.

Delete-mode matrix (SURVEY §3.2; run_task dispatch redshift_sink.py:599-607):
  default            : apply deletes
  skip_delete        : deletes treated as upserts (kept in target) — the
                       *intended* semantics of the reference's "ture"-typo
                       branch (redshift_sink.py:456-457)
  save_delete        : also emit last delete image per key -> <table>_delete
  only_save_delete   : emit ONLY the delete stream, no merge

Scale notes: the anti-join shuffles on the pk unless the updates side is
broadcastable. For a partitioned target table, pre-partitioning both sides by
pk (bucketing) turns this into a co-located join; at 100 TB the right shape
is `updates` (≤ rate-limit rows) broadcast against a pk-pruned target scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import lww_dedup


def merge_changes(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    op_col: str = "op",
    delete_op: str = "d",
    skip_delete: bool = False,
    order_by: Sequence[str] = ("ts_ms",),
    dedup_updates: bool = True,
    broadcast_updates: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """Apply a changelog batch to a keyed target; returns the new target.

    `updates` is a flat changelog (payload cols + op). Bookkeeping columns
    (op / ts_ms / data_index_aws) are dropped from the inserted rows, matching
    the reference's insert column list (redshift_sink.py:445-446).

    Strategies:
      * "union_window" (default): target ∪ updates -> one LWW window per key
        (updates always outrank target rows), winners minus deletes. The
        updates lineage is evaluated ONCE and the whole merge is a single
        hash shuffle — preferred when the batch isn't tiny relative to the
        target, or when updates sit on an expensive lineage (JSON parse).
      * "anti_join": target LEFT ANTI updates.keys ∪ surviving updates —
        with `broadcast_updates` the target never shuffles at all; preferred
        for a small rate-limited batch against a huge keyed target (the
        100 TB streaming shape). Note: consumes `updates` twice, so cache
        the batch upstream (the streaming shell does).
    """
    keys = list(keys)
    tiebreak = [c for c in ("data_index_aws",) if c in updates.columns]
    order = list(order_by) + tiebreak
    if strategy == "auto":
        strategy = "anti_join" if broadcast_updates else "union_window"

    if strategy == "union_window":
        # single-pass merge: stamp provenance, one window over the union
        u_side = updates.select(
            *target.columns,
            F.lit(1).alias("__is_new"),
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__o_{c}") for c in order],
        )
        t_side = target.select(
            *target.columns,
            F.lit(0).alias("__is_new"),
            F.lit(None).cast("string").alias("__op"),
            *[
                F.lit(None).cast(dict(updates.dtypes)[c]).alias(f"__o_{c}")
                for c in order
            ],
        )
        w = Window.partitionBy(*keys).orderBy(
            F.desc("__is_new"),
            *[F.desc_nulls_last(f"__o_{c}") for c in order],
        )
        winners = (
            t_side.unionByName(u_side)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        if not skip_delete:
            winners = winners.filter(
                (F.col("__is_new") == 0) | (F.col("__op") != delete_op)
            )
        return winners.select(*target.columns)

    if dedup_updates:
        updates = lww_dedup(updates, keys, order)
    join_side = F.broadcast(updates.select(*keys)) if broadcast_updates else updates.select(*keys)
    survivors = target.join(join_side, on=keys, how="left_anti")
    incoming = updates if skip_delete else updates.filter(F.col(op_col) != delete_op)
    drop_cols = [c for c in (op_col, "ts_ms", "data_index_aws") if c in incoming.columns]
    incoming = incoming.drop(*drop_cols)
    return survivors.unionByName(incoming.select(*target.columns))


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    *,
    order_col: str = "ts_ms",
    op_col: str = "op",
    delete_op: str = "d",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a flat changelog: one
    row per non-delete change event, valid from its own timestamp until
    the NEXT event on the key (any op — an update supersedes, a delete
    closes). The open version (`valid_to` NULL) is flagged `is_current`;
    a key whose last event is a delete ends with no current row.

    `tiebreak_cols` break equal-`order_col` ties (the CDC feed's
    data_index_aws arrival counter, mirroring lww_dedup/merge_changes) so
    same-timestamp events on a key get a DETERMINISTIC version order —
    without it, lead() over ties is nondeterministic and incremental
    replay can diverge from a full rebuild. Tied events still produce
    zero-length versions (valid_to == valid_from) by design: every
    intermediate state is a version. Tiebreak columns are ordering-only
    and do not land in the history schema.

    This is the warehouse-side companion of `merge_changes`: merge keeps
    only latest state, SCD2 keeps every state with its validity interval —
    the standard dimension-history build (Kimball type 2) downstream of a
    CDC feed. One window shuffle on the key; no self-join.
    """
    order = [F.col(order_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        changelog.withColumn("valid_to", F.lead(order_col).over(w))
        .filter(F.col(op_col) != delete_op)
        .withColumn("valid_from", F.col(order_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col, order_col, *tiebreak_cols)
    )


def scd2_merge_batch(
    history: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    *,
    order_col: str = "ts_ms",
    op_col: str = "op",
    delete_op: str = "d",
    tiebreak_cols: Sequence[str] = (),
    dedup_replayed: bool = False,
) -> DataFrame:
    """Incrementally maintain an SCD2 history table from one micro-batch of
    changelog rows (the streaming counterpart of `scd2_history`): close the
    table's open version for every key the batch touches (its `valid_to`
    becomes the batch's first event time for that key), then append the
    batch's own versions. Replaying a changelog batch-by-batch from an
    empty history produces EXACTLY `scd2_history` of the full changelog —
    property-tested — provided per-key event-time order is preserved
    across batches (the Kafka-partition-by-key contract the reference
    pipeline already relies on).

    Replay safety (foreachBatch is at-least-once) vs cross-batch ties —
    two regimes, selected by `dedup_replayed`:

    * `dedup_replayed=False` (default — the streaming job's path, which
      skips replayed batches entirely via the store's transactional
      batch_id, so each batch is applied EXACTLY once): the close fires
      whenever the open version started at-or-before the batch
      (`__batch_start >= valid_from`). The equality case is the
      cross-batch same-timestamp tie — a genuinely new batch whose first
      event for a key carries the SAME order_col value as the open
      version's valid_from (millisecond CDC ties straddling a
      micro-batch boundary). The open version is closed as a zero-length
      version exactly like `scd2_history`'s full rebuild does for tied
      events, preserving the ≤1-open-row-per-key invariant.
    * `dedup_replayed=True` (no batch tracking, replays possible): the
      close is STRICT (`__batch_start > valid_from`) so re-applying a
      batch can never close the batch's own open version; replayed rows
      are then removed with a full-row dropDuplicates scoped to the
      touched keys (full-row, so distinct same-timestamp versions are
      never collapsed). LIMITATION: on order_col alone this path cannot
      distinguish "re-applied own open version" from "genuinely new
      tied event", so a cross-batch tie leaves the old row open (two
      current rows) until a later untied event closes it — with
      at-least-once delivery and only an event-time column, that
      ambiguity is inherent; use transactional batch tracking (the
      default regime) when exact tie semantics matter.

    Scale shape: the only join is history against the batch's one-row-
    per-key first-event aggregate — broadcastable at any history size
    (a micro-batch is rate-limited); the batch's own window is batch-local;
    the replay dedup (when enabled) shuffles only the touched keys'
    history, never the whole table. `history=None` bootstraps from empty.
    """
    new_versions = scd2_history(
        batch, keys, order_col=order_col, op_col=op_col, delete_op=delete_op,
        tiebreak_cols=tiebreak_cols,
    )
    first_ts = batch.groupBy(*[F.col(k) for k in keys]).agg(
        F.min(order_col).alias("__batch_start")
    )
    if history is None:
        return new_versions
    joined = history.join(F.broadcast(first_ts), list(keys), "left")
    close_cmp = (
        (F.col("__batch_start") > F.col("valid_from"))
        if dedup_replayed
        else (F.col("__batch_start") >= F.col("valid_from"))
    )
    closed_expr = F.when(
        F.col("is_current") & F.col("__batch_start").isNotNull() & close_cmp,
        F.col("__batch_start"),
    ).otherwise(F.col("valid_to"))
    if not dedup_replayed:
        closed = (
            joined.withColumn("valid_to", closed_expr)
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop("__batch_start")
        )
        # schema drift across batches: columns added to (or dropped from)
        # the changelog must not break the history — align symmetrically,
        # null-filling whichever side lacks a column (the SCD2 analog of
        # the main target's D1-D6 evolution path)
        return closed.unionByName(new_versions, allowMissingColumns=True)
    untouched = joined.filter(F.col("__batch_start").isNull()).drop("__batch_start")
    touched = (
        joined.filter(F.col("__batch_start").isNotNull())
        .withColumn("valid_to", closed_expr)
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__batch_start")
    )
    merged = touched.unionByName(
        new_versions, allowMissingColumns=True
    ).dropDuplicates()
    return untouched.unionByName(merged, allowMissingColumns=True)
