"""Streaming shell: foreachBatch micro-batch loop with multi-table fan-out.

Mirrors the reference's job lifecycle (glue/cdc_redshift.py:115-156):
  * cache the batch once, fan out one task per sync rule over the SAME
    cached DataFrame (T10; reference uses a driver ThreadPoolExecutor with
    FAIR scheduling, glue/cdc_redshift.py:26, 119-127)
  * per table: route -> parse -> type-convert -> LWW dedup -> merge into the
    keyed target (+ optional delete-stream table)
  * fail-fast: any task error aborts the batch so the checkpoint retries it
    (T11, glue/cdc_redshift.py:129-136)
  * batch watchdog: a batch exceeding `batch_timeout_sec` raises
    (T8, emr_ec2/cdc_redshift.py:73-77, 131-143)

The processor is source-agnostic: any stream producing a `value: string`
column works (Kafka in production — sources/kafka.py; a file source in
tests, which exercises identical trigger/checkpoint semantics).
"""

from __future__ import annotations

import concurrent.futures as cf
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark.sql import functions as F

from ..config import SyncRule
from ..operators.dedup import latest_deletes, lww_dedup
from ..operators.merge import merge_changes
from ..operators.normalize import (
    route_parse_canal,
    route_parse_debezium,
    route_parse_dms,
    route_parse_mongo,
)
from ..operators.schema_evolution import cast_to_target, diff_schemas
from ..operators.typeconv import apply_rule_conversions
from ..sources.infer import infer_payload_schema
from .store import ParquetTargetStore

# fused route+parse: one JSON tokenization per topic row per table task
# (replaces the two-step route_* probe + parse_* from_json — see
# operators/normalize.py "Fused route + parse")
_ROUTE_PARSERS = {
    "FLINK-CDC": route_parse_debezium,
    "MSK-DEBEZIUM-CDC": route_parse_debezium,
    "DMS-CDC": route_parse_dms,
    "CANAL-CDC": route_parse_canal,
}

#: per-format JSON paths + predicates of the ROUTING DECISION — not just
#: the (db, table) keys: the census must apply every filter the fused
#: parser applies (op-code isin, DMS control-record drop, Canal's
#: non-empty data[] requirement), or a batch holding only e.g. a Canal
#: DDL event for the table counts >0 while the parse comes back empty —
#: and the rule would publish empty target versions / flip batch-id
#: pointers for a batch that contributed nothing. Used to take ONE
#: per-batch routing census instead of one isEmpty probe job per rule
#: (the A1/A2 probe, redshift_sink.py:585). At a reference-shaped ~100-
#: rule fan-out that is ~100 driver-side jobs per micro-batch replaced
#: by one combinable count over the cached batch.
_ROUTE_CENSUS = {
    "FLINK-CDC": {
        "db": "$.source.db", "tb": "$.source.table",
        "op": "$.op", "ops": ("c", "u", "d", "r"),
    },
    "MSK-DEBEZIUM-CDC": {
        "db": "$.source.db", "tb": "$.source.table",
        "op": "$.op", "ops": ("c", "u", "d", "r"),
    },
    "DMS-CDC": {
        "db": "$.metadata.schema-name", "tb": "$.metadata.table-name",
        "op": "$.metadata.operation",
        "ops": ("load", "insert", "update", "delete"),
        "ctl": "$.metadata.record-type",
    },
    "CANAL-CDC": {
        "db": "$.database", "tb": "$.table",
        "op": "$.type", "ops": ("INSERT", "UPDATE", "DELETE"),
        # posexplode of data[] yields zero rows for empty/null/non-array
        "array": "$.data",
    },
    "MONGO-CDC": {
        "db": "$.ns.db", "tb": "$.ns.coll",
        "op": "$.operationType",
        "ops": ("insert", "update", "replace", "delete"),
    },
}


@dataclass
class TaskStatus:
    table: str
    status: str  # finished | no-data | error
    error: str | None = None
    rows: int = 0


# Shell defaults for a FRESH dedup-ingest state with no explicit
# dedup_lsh_* keys: library semantics except max_bucket, which defaults
# BOUNDED (the hot-bucket guard on by default in production; 0/"none"
# in config = unbounded exact recall). A standing params manifest
# always outranks these — see _dedup_ingestor.
SHELL_LSH_DEFAULTS = {
    "n": 3, "num_hashes": 12, "band_size": 2, "threshold": 0.5,
    "max_bucket": 64,
}


class CdcBatchProcessor:
    def __init__(
        self,
        spark: SparkSession,
        rules: list[SyncRule],
        store: ParquetTargetStore,
        *,
        cdc_format: str = "FLINK-CDC",
        payload_schemas: dict[str, T.StructType] | None = None,
        infer_sample_limit: int | None = None,
        max_workers: int = 8,
        order_by: tuple[str, ...] = ("ts_ms",),
        jdbc_sink=None,
        compact_every_n_batches: int | None = None,
        compact_target_bytes: int = 128 * 1024 * 1024,
        max_deltas_before_fold: int | None = 32,
        keep_versions: int | str | None = 2,
        prune_grace_sec: float | int | str = 300.0,
    ):
        self.spark = spark
        self.rules = rules
        self.store = store
        self.cdc_format = cdc_format
        # payload_schemas=None (or a missing table key) = the reference's
        # zero-declaration mode: the schema is re-inferred from each batch
        # (cdc_util/redshift_sink.py:592), so drift is picked up per batch
        # and flows into schema evolution downstream. Declared schemas skip
        # the inference scan — the right call at scale.
        self.payload_schemas = payload_schemas or {}
        self.infer_sample_limit = infer_sample_limit
        self.max_workers = max_workers
        self.order_by = list(order_by)
        # external JDBC target (JdbcMergeSink): the warehouse runs the merge
        # transaction (stage -> DELETE USING -> INSERT re-deduped), so the
        # in-engine target merge is skipped — parity with the reference's
        # Redshift write path (cdc_util/redshift_sink.py:477-527)
        self.jdbc_sink = jdbc_sink
        # periodic small-file compaction (operators/layout.py): every batch
        # publish writes a fresh file-set, so long-running jobs accrue tiny
        # files; every N successful batches the targets are republished at
        # ~compact_target_bytes through the store's atomic version swap —
        # the VACUUM half of the reference's Redshift-side maintenance
        self.compact_every_n_batches = compact_every_n_batches
        self.compact_target_bytes = compact_target_bytes
        # delta-count backstop, DECOUPLED from the compaction cadence: a
        # store that accrues per-batch deltas (merge-on-read targets, the
        # append-logged delete log / quarantine under either mode) folds
        # whenever a table's committed-but-unfolded delta count reaches
        # this cap, even when compact_every_n_batches is unset or
        # misconfigured large — otherwise read amplification (N delta
        # list-reads per query) grows unbounded between compactions
        self.max_deltas_before_fold = max_deltas_before_fold
        # version-chain retention: every publish adds a full version dir
        # (copy-on-write) or a folded base (merge-on-read). keep_versions=N
        # prunes to the newest N dirs after every batch
        # (store.prune_versions — the Delta-VACUUM analog). DEFAULT 2:
        # under copy-on-write, keep-all is O(batches) FULL-CORPUS copies
        # (the r10 churn audit measures the growth line — 25 dirs /
        # 14.59 MB in 24 toy batches; at 100 TB that default would be
        # petabytes in hours), so a long-running job must opt INTO
        # unbounded history, never fall into it. None / "all" / 0 is the
        # explicit keep-everything opt-out for replay audits.
        if isinstance(keep_versions, str):
            keep_versions = (
                None if keep_versions.strip().lower() in ("all", "none")
                else int(keep_versions)
            )
        if keep_versions == 0:
            keep_versions = None
        if keep_versions is not None and keep_versions < 1:
            raise ValueError(
                f"keep_versions={keep_versions!r}: use a positive count, "
                "or 0/'all' to keep every version"
            )
        self.keep_versions = keep_versions
        # reader-grace window on top of the version count (r11 ADVICE:
        # with per-batch pruning and a fast trigger, keep>=2 alone is one
        # BATCH of grace, not one compaction cycle — a concurrent reader
        # that resolved the pointer a few publishes ago would lose its
        # files mid-scan). A version newer than this many seconds is
        # never pruned; the Delta-VACUUM retention-hours analog, scaled
        # to micro-batch cadence. 0 disables (tests; offline jobs with
        # no concurrent readers).
        prune_grace_sec = float(prune_grace_sec)
        if prune_grace_sec < 0:
            raise ValueError(
                f"prune_grace_sec={prune_grace_sec!r}: use seconds >= 0"
            )
        self.prune_grace_sec = prune_grace_sec
        self._prune_warned: set[str] = set()
        self._batches_since_compact = 0
        self.batch_statuses: list[list[TaskStatus]] = []  # per processed batch
        self.compact_errors: list[tuple[str, str]] = []  # (table, error)
        self._dedup_ingestors: dict[str, object] = {}  # rule target -> DedupIngest
        self._ann_ingestors: dict[str, object] = {}  # rule target -> VersionedAnnIndex
        self._bm25_ingestors: dict[str, object] = {}  # rule target -> RetrievalIngest

    def _dedup_ingestor(self, rule: SyncRule):
        """Lazily build one DedupIngest per dedup_ingest rule, stateful in
        an AppendLog under the store root (survives restarts; replay-
        idempotent via its committed-batch manifest)."""
        ing = self._dedup_ingestors.get(rule.target_name)
        if ing is None:
            import os

            from .dedup_ingest import DedupIngest
            from .store import AppendLog

            # LSH tuning resolution, in precedence order (r11 verdict
            # item + the r12 upgrade-compat review):
            #   1. EXPLICIT per-rule dedup_lsh_* keys — authoritative; a
            #      mismatch against a standing manifest refuses at
            #      ingest, pointing at migrate_lsh (the no-silent-mix
            #      contract).
            #   2. the state's standing params MANIFEST — an upgraded
            #      deployment with no config change keeps the exact
            #      parameters its index was built with (flipping the
            #      shell default must not brick pre-existing state
            #      behind the manifest refusal).
            #   3. SHELL_LSH_DEFAULTS — new state with no keys gets the
            #      BOUNDED max_bucket: at corpus scale an unbounded
            #      boilerplate band bucket makes the candidate join
            #      quadratic in one reducer, and a knob the production
            #      path cannot reach without code is not a knob.
            log = AppendLog(os.path.join(self.store.root, "_dedup_state"))
            manifested = self._read_lsh_manifest(log, rule.target_name)
            base = manifested if manifested is not None else dict(SHELL_LSH_DEFAULTS)
            explicit = {
                k: v for k, v in (
                    ("n", rule.dedup_lsh_n),
                    ("num_hashes", rule.dedup_lsh_num_hashes),
                    ("band_size", rule.dedup_lsh_band_size),
                    ("threshold", rule.dedup_lsh_threshold),
                ) if v is not None
            }
            if rule.dedup_lsh_max_bucket != "unset":
                explicit["max_bucket"] = rule.dedup_lsh_max_bucket
            params = {**base, **explicit}
            ing = DedupIngest(
                log,
                name=rule.target_name,
                id_col=rule.primary_key[0],
                text_col=rule.dedup_text_column,
                **params,
            )
            self._dedup_ingestors[rule.target_name] = ing
        return ing

    @staticmethod
    def _read_lsh_manifest(log, name: str) -> dict | None:
        """The standing LSH params manifest for state `name`, or None.
        Read through a throwaway DedupIngest's path helper so the path
        spelling has exactly one owner (dedup_ingest._params_path)."""
        import json

        from .dedup_ingest import DedupIngest

        probe = DedupIngest(log, name=name)
        try:
            with open(probe._params_path()) as f:
                m = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            return None
        return m if isinstance(m, dict) else None

    def _ann_ingestor(self, rule: SyncRule):
        """Lazily build one VersionedAnnIndex per ann_ingest rule, stateful
        in an AppendLog under the store root (survives restarts; replay-
        idempotent via manifest + post-rebuild watermark)."""
        ann = self._ann_ingestors.get(rule.target_name)
        if ann is None:
            import os

            from .ann_ingest import VersionedAnnIndex
            from .store import AppendLog

            ann = VersionedAnnIndex(
                AppendLog(os.path.join(self.store.root, "_ann_state")),
                name=rule.target_name,
                id_col=rule.primary_key[0],
                vec_col=rule.ann_vec_column,
                n_centroids=rule.ann_n_centroids,
                drift_floor=rule.ann_drift_floor,
                pq_n_sub=rule.ann_pq_n_sub,
                pq_n_codes=rule.ann_pq_n_codes,
            )
            self._ann_ingestors[rule.target_name] = ann
        return ann

    def _bm25_ingestor(self, rule: SyncRule):
        """Lazily build one RetrievalIngest per bm25_ingest rule, stateful
        in an AppendLog under the store root (survives restarts; replay-
        idempotent via its committed-batch manifest)."""
        ing = self._bm25_ingestors.get(rule.target_name)
        if ing is None:
            import os

            from .retrieval_ingest import RetrievalIngest
            from .store import AppendLog

            ing = RetrievalIngest(
                AppendLog(os.path.join(self.store.root, "_bm25_state")),
                name=rule.target_name,
                id_col=rule.primary_key[0],
                text_col=rule.bm25_text_column,
                positions=rule.bm25_positions,
            )
            self._bm25_ingestors[rule.target_name] = ing
        return ing

    def migrate_bm25_positions(self, target_name: str) -> None:
        """Upgrade a rule's standing BM25 index to the positional layout
        in place. The shell retains exactly what the index-level
        migration needs — the live corpus IS the rule's published target
        table — so the config-flip workflow is: set `bm25_positions`
        true on the rule, run this once (offline, same single-writer
        window as the maintenance cycle), and the stream continues
        positional; without it the next batch refuses with the
        layout-mix error that names this path. Fidelity is verified by
        the index-level migration (the target's text must re-tokenize
        to the standing postings exactly), so a target whose text
        column drifted from what was indexed raises instead of serving
        silently wrong phrase positions."""
        rule = next(
            (r for r in self.rules if r.target_name == target_name), None
        )
        if rule is None:
            raise ValueError(f"no sync rule targets {target_name!r}")
        corpus = self.store.read(self.spark, target_name)
        if corpus is None:
            raise ValueError(
                f"target {target_name!r} has no published rows to "
                "rebuild positions from"
            )
        self._bm25_ingestor(rule).migrate_positions(
            corpus.select(rule.primary_key[0], rule.bm25_text_column)
        )

    def _apply_quality_gate(
        self, parsed: DataFrame, rule: SyncRule, batch_id
    ) -> DataFrame:
        """Ingest-time document quality gate (functions/text.gopher_flag_cols):
        batch rows failing the rule filters never reach any target; they
        land — payload plus audit flags — in <table>_rejected, the
        quarantine channel (the curation analog of the delete stream:
        dropped, but auditable and replayable). Delete images carry no
        text and always pass through.

        Gating is PER ROW, not per key: a CDC micro-batch routinely
        carries several images of one pk (insert then update) with
        different text, and each image is kept or quarantined on its own
        text — a key-level join would cross-product images × flag rows
        and let any passing image vouch for a failing update. Because the
        flags are plain column expressions attached in place, the gate is
        a map-only filter: zero joins, zero shuffles, at any scale.
        Threshold overrides ride the rule's `quality_*` extra keys.
        Replay-safe like the delete log: the quarantine is an O(|batch|)
        manifest-guarded append under BOTH store modes (the copy-on-write
        store routes it through its own AppendLog)."""
        from ..functions.text import gopher_flag_cols

        kw = {}
        for k in ("min_words", "max_words", "min_mean_word_len",
                  "max_mean_word_len", "min_ttr", "min_req_stopwords"):
            v = rule.extra.get(f"quality_{k}")
            if v is not None:
                kw[k] = float(v) if "len" in k or "ttr" in k else int(v)
        has_op = "op" in parsed.columns
        docs = parsed.filter(F.col("op") != "d") if has_op else parsed
        flags = gopher_flag_cols(rule.dedup_text_column, **kw)
        flagged = docs.select(
            "*", *[c.alias(n) for n, c in flags.items()]
        )
        # NULL-text policy: a non-delete image with NULL text evaluates
        # every flag (and keep) to NULL, which both filters below would
        # drop — the row would vanish from the pipeline with no audit
        # trail. Coalesce keep to an explicit QUARANTINE decision, with
        # `null_text` as the audit flag (the other flags are NULL, which
        # is itself the "never measured" signal).
        keep = F.coalesce(F.col("keep"), F.lit(False))
        rejected = (
            flagged.filter(~keep)
            .withColumn("null_text", F.col("keep").isNull())
            .drop("keep")
        )
        self.store.publish_append(
            rejected, f"{rule.target_name}_rejected", batch_id
        )
        passing = flagged.filter(keep).drop(*flags.keys())
        if has_op:
            passing = passing.unionByName(parsed.filter(F.col("op") == "d"))
        return passing

    # -- per-table task ----------------------------------------------------
    def _batch_route_counts(self, batch_df: DataFrame) -> dict | None:
        """One routing census for the whole batch: rows per (db, table)
        under the format's FULL routing decision — keys plus the fused
        parser's op-code / control-record / non-empty-array predicates,
        so a positive count genuinely implies a non-empty parse (a count
        over keys alone would let an op-filtered-out event — a Canal DDL,
        an unknown Debezium op — publish empty target versions). Replaces
        the per-rule isEmpty probe job for exact-match rules — at an
        N-rule fan-out, 1 job instead of N. Returns None for formats
        without a declared census (those rules keep the per-rule probe)."""
        spec = _ROUTE_CENSUS.get(self.cdc_format)
        if spec is None:
            return None
        v = F.col("value")
        df = batch_df.select(
            F.get_json_object(v, spec["db"]).alias("__db"),
            F.get_json_object(v, spec["tb"]).alias("__tb"),
            F.get_json_object(v, spec["op"]).alias("__op"),
            *(
                [F.get_json_object(v, spec["ctl"]).alias("__ctl")]
                if "ctl" in spec else []
            ),
            *(
                [F.get_json_object(v, spec["array"]).alias("__arr")]
                if "array" in spec else []
            ),
        ).filter(F.col("__op").isin(*spec["ops"]))
        if "ctl" in spec:
            df = df.filter(F.col("__ctl") != "control")
        if "array" in spec:
            df = df.filter(F.json_array_length("__arr") > 0)
        return {
            (r["__db"], r["__tb"]): r["cnt"]
            for r in df.groupBy("__db", "__tb")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    def _run_table(
        self, batch_df: DataFrame, rule: SyncRule, job_group: str | None = None,
        batch_id: int | None = None, route_counts: dict | None = None,
    ) -> TaskStatus:
        try:
            if job_group is not None:
                # tag every Spark job this task submits so the batch
                # watchdog can cancel them (thread-local property;
                # interruptOnCancel interrupts the running task threads)
                self.spark.sparkContext.setJobGroup(
                    job_group, f"cdc sync {rule.target_name}", interruptOnCancel=True
                )
            fmt = self.cdc_format
            is_regex = any(ch in rule.table for ch in ".*+?[](){}|^$\\")
            # exact-match rules consult the shared routing census instead
            # of running their own probe job; regex rules keep the
            # per-rule probe (rlike dialect stays JVM-side, un-replicated)
            precounted = (
                route_counts is not None and not is_regex
            )
            if precounted and route_counts.get((rule.db, rule.table), 0) == 0:
                return TaskStatus(rule.target_name, "no-data")
            if fmt == "MONGO-CDC":
                parsed = route_parse_mongo(batch_df, rule.db, rule.table)
            else:
                schema = self.payload_schemas.get(rule.target_name)
                if schema is None:
                    schema = infer_payload_schema(
                        batch_df, fmt, rule.db, rule.table,
                        table_is_regex=is_regex,
                        sample_limit=self.infer_sample_limit,
                    )
                    if schema is None:
                        return TaskStatus(rule.target_name, "no-data")
                parsed = _ROUTE_PARSERS[fmt](
                    batch_df, rule.db, rule.table, schema,
                    table_is_regex=is_regex,
                )
            if not precounted and parsed.isEmpty():
                # the A1/A2 empty probe — only rules the census can't
                # cover pay a probe job (the census applies the parser's
                # op/control/array predicates too, so a positive count
                # implies a non-empty parse)
                return TaskStatus(rule.target_name, "no-data")
            parsed = apply_rule_conversions(parsed, rule)
            if rule.quality_gate:
                parsed = self._apply_quality_gate(parsed, rule, batch_id)

            order = self.order_by + (
                ["data_index_aws"] if "data_index_aws" in parsed.columns else []
            )
            n = 0
            if self.jdbc_sink is not None:
                if not rule.only_save_delete:
                    updates = lww_dedup(parsed, list(rule.primary_key), order)
                    if "data_index_aws" in updates.columns:
                        updates = updates.drop("data_index_aws")  # P4
                    self.jdbc_sink.apply_batch(
                        updates, db=rule.db, table=rule.target_name,
                        keys=list(rule.primary_key),
                        skip_delete=rule.skip_delete,
                    )
                if rule.save_delete or rule.only_save_delete:
                    dels = latest_deletes(parsed, list(rule.primary_key), order)
                    self.jdbc_sink.append_table(dels, f"{rule.target_name}_delete")
                return TaskStatus(rule.target_name, "finished")
            if not rule.only_save_delete and hasattr(self.store, "publish_delta"):
                # merge-on-read target (MergeOnReadTargetStore): the batch
                # appends its LWW-deduped changelog as a delta — O(|batch|)
                # written, the standing target untouched; resolution happens
                # at read, and the periodic compaction cycle folds deltas
                # into the base. Replay-idempotent: the delta commit is
                # guarded by the AppendLog manifest, and re-applying a
                # folded batch re-picks identical winners by construction.
                updates = lww_dedup(parsed, list(rule.primary_key), order)
                if rule.ignore_ddl:
                    base = self.store.read(self.spark, rule.target_name)
                    if base is not None:
                        updates = cast_to_target(
                            updates, base.schema,
                            passthrough=("op", "ts_ms", "data_index_aws"),
                        )
                self.store.publish_delta(
                    updates, rule.target_name, batch_id,
                    keys=list(rule.primary_key),
                    skip_delete=rule.skip_delete,
                )
            elif not rule.only_save_delete:
                updates = lww_dedup(parsed, list(rule.primary_key), order)
                target = self.store.read(self.spark, rule.target_name)
                if target is not None:
                    bookkeeping = {"op", "ts_ms", "data_index_aws"}
                    incoming = T.StructType(
                        [f for f in updates.schema.fields if f.name not in bookkeeping]
                    )
                    if rule.ignore_ddl:
                        # fixed-schema mode: cast incoming to the target's
                        # types, extra columns dropped
                        # (redshift_schema_evolution.py:137-155)
                        updates = cast_to_target(
                            updates, target.schema, passthrough=tuple(bookkeeping)
                        )
                    else:
                        # schema evolution: ADD new columns to the target
                        # (null-filled) and DROP removed ones
                        # (redshift_schema_evolution.py:57-69, 188-211)
                        d = diff_schemas(incoming, target.schema)
                        if not d.empty:
                            by_name = {f.name: f for f in incoming.fields}
                            for c in d.add:
                                target = target.withColumn(
                                    c, F.lit(None).cast(by_name[c].dataType)
                                )
                            target = target.drop(*d.drop)
                if target is None:
                    out = updates.filter("op != 'd'").drop(
                        *[c for c in ("op", "ts_ms", "data_index_aws") if c in updates.columns]
                    )
                else:
                    out = merge_changes(
                        target,
                        updates,
                        list(rule.primary_key),
                        skip_delete=rule.skip_delete,
                        order_by=order,
                        dedup_updates=False,
                        broadcast_updates=True,
                    )
                self.store.publish(out, rule.target_name)
                # row count from the published files' parquet footers — the
                # publish write already computed the merge once; counting the
                # plan again would re-run the whole join (2x per batch)
                n = self.store.read(self.spark, rule.target_name).count()
            if rule.scd2_history:
                # SCD2 dimension history alongside the latest-state target:
                # close the open version for every batch key, append the
                # batch's own versions (operators/merge.py scd2_merge_batch;
                # replaying batches == one-shot scd2_history, property-
                # tested). Uses ALL batch events, not the LWW-deduped set —
                # every intermediate state is a version; data_index_aws is
                # kept as the equal-timestamp tiebreak (same order contract
                # as lww_dedup/merge_changes) and dropped by the operator.
                htable = f"{rule.target_name}_history"
                tiebreak = [c for c in order[1:] if c in parsed.columns]
                if hasattr(self.store, "publish_scd2_delta"):
                    # merge-on-read history: append the batch's raw events
                    # (O(|batch|) written); resolution — close open
                    # versions, append new ones — happens at read via one
                    # scd2_merge_batch over base + accumulated deltas, and
                    # the maintenance fold materializes it. Replay guard
                    # spans folds via has_applied (delta manifest OR the
                    # base pointer's last folded batch id).
                    self.store.publish_scd2_delta(
                        parsed, htable, batch_id,
                        keys=list(rule.primary_key),
                        order_col=self.order_by[0],
                        tiebreak_cols=tiebreak,
                    )
                else:
                    from ..operators.merge import scd2_merge_batch

                    # foreachBatch is at-least-once and this path is read-
                    # modify-append: skip a batch whose id is already
                    # committed in the history's version pointer (recorded
                    # atomically with the publish below), so a checkpoint
                    # retry can never re-close or re-append what attempt
                    # one already landed
                    if (
                        batch_id is None
                        or self.store.last_batch_id(htable) != batch_id
                    ):
                        prev_hist = self.store.read(self.spark, htable)
                        new_hist = scd2_merge_batch(
                            prev_hist, parsed, list(rule.primary_key),
                            order_col=self.order_by[0],
                            tiebreak_cols=tiebreak,
                        )
                        self.store.publish(new_hist, htable, batch_id=batch_id)
            if rule.stats_group_columns and rule.stats_value_column:
                # incremental aggregate maintenance (functions/incremental):
                # fold the batch's mergeable per-group stats into
                # <table>_stats algebraically — O(|groups| + |batch|) per
                # ingest, the corpus never rescanned. Batch-id-guarded like
                # the SCD2 history: a checkpoint retry of a batch whose
                # stats already committed is skipped, so at-least-once
                # delivery cannot double-count. Contract: append-only feed
                # (each non-delete image is one observation).
                from ..functions.incremental import group_stats, merge_group_stats

                stable = f"{rule.target_name}_stats"
                if (
                    batch_id is None
                    or self.store.last_batch_id(stable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    bs = group_stats(
                        obs, list(rule.stats_group_columns),
                        rule.stats_value_column,
                    )
                    prev_stats = self.store.read(self.spark, stable)
                    self.store.publish(
                        merge_group_stats(
                            prev_stats, bs, list(rule.stats_group_columns)
                        ),
                        stable, batch_id=batch_id,
                    )
            if (
                rule.stats_group_columns
                and rule.stats_value_column
                and rule.stats_current_state
                and fmt in ("FLINK-CDC", "MSK-DEBEZIUM-CDC")
            ):
                # CURRENT-STATE stats through updates/deletes: re-parse
                # this rule's slice WITH before images (only this rule
                # pays the extra parse) and fold the signed retract/
                # assert census into <table>_state_stats. Batch-id-
                # guarded: signed addition is not idempotent.
                from ..functions.incremental import (
                    group_stats_cdc,
                    merge_group_stats_cdc,
                )

                # Each state table is batch-id-guarded INDEPENDENTLY and at
                # the SAME nesting level: a retry of a batch that crashed
                # after the stats publish but before the cms/qsketch
                # publishes must still fold this batch's signed delta into
                # the tables that missed it. Nesting the sketch guards
                # inside the stats guard would skip them forever once the
                # stats table shows the batch as committed (the contract
                # AnnIngest.process_batch keeps for its codes table).
                cstable = f"{rule.target_name}_state_stats"
                cmtable = (
                    f"{rule.target_name}_state_cms"
                    if rule.stats_topk_column else None
                )
                cqtable = (
                    f"{rule.target_name}_state_qsketch"
                    if rule.stats_quantile_column else None
                )

                def _needs(table: str | None) -> bool:
                    return table is not None and (
                        batch_id is None
                        or self.store.last_batch_id(table) != batch_id
                    )

                need_cs = _needs(cstable)
                need_cm = _needs(cmtable)
                need_cq = _needs(cqtable)
                if need_cs or need_cm or need_cq:
                    schema = self.payload_schemas.get(rule.target_name)
                    if schema is None:
                        schema = infer_payload_schema(
                            batch_df, fmt, rule.db, rule.table,
                            table_is_regex=is_regex,
                            sample_limit=self.infer_sample_limit,
                        )
                    if schema is not None:  # else: no routed rows -> no delta
                        withb = route_parse_debezium(
                            batch_df, rule.db, rule.table, schema,
                            table_is_regex=is_regex, emit_before=True,
                        )
                        # no rule typeconv here: the census casts the
                        # value itself, and conversions applied to the
                        # FLAT columns but not the nested before image
                        # would break the retract/assert symmetry
                        if need_cs:
                            delta = group_stats_cdc(
                                withb,
                                list(rule.stats_group_columns),
                                rule.stats_value_column,
                            )
                            prev_cs = self.store.read(self.spark, cstable)
                            self.store.publish(
                                merge_group_stats_cdc(
                                    prev_cs, delta,
                                    list(rule.stats_group_columns),
                                ),
                                cstable, batch_id=batch_id,
                            )
                        if need_cm:
                            # current-state heavy hitters: CMS counters
                            # are sums, and sums retract — the signed
                            # twin of the <table>_cms event sketch,
                            # riding the same before-image parse.
                            from ..functions.incremental import (
                                group_freq_sketch_cdc,
                                merge_freq_sketches_cdc,
                            )

                            cdelta = group_freq_sketch_cdc(
                                withb,
                                list(rule.stats_group_columns),
                                rule.stats_topk_column,
                            )
                            prev_cm = self.store.read(
                                self.spark, cmtable
                            )
                            self.store.publish(
                                merge_freq_sketches_cdc(
                                    prev_cm, cdelta,
                                    list(rule.stats_group_columns),
                                ),
                                cmtable, batch_id=batch_id,
                            )
                        if need_cq:
                            # current-state quantile histogram: bucket
                            # counts are sums too, so the same signed
                            # fold keeps read-time quantile estimates
                            # tracking the live table
                            from ..functions.incremental import (
                                group_quantile_sketch_cdc,
                                merge_quantile_sketches_cdc,
                            )

                            qdelta = group_quantile_sketch_cdc(
                                withb,
                                list(rule.stats_group_columns),
                                rule.stats_quantile_column,
                            )
                            prev_cq = self.store.read(
                                self.spark, cqtable
                            )
                            self.store.publish(
                                merge_quantile_sketches_cdc(
                                    prev_cq, qdelta,
                                    list(rule.stats_group_columns),
                                ),
                                cqtable, batch_id=batch_id,
                            )
            if rule.stats_group_columns and rule.stats_distinct_column:
                # mergeable HLL distinct-count maintenance: the census
                # column algebraic parts can't carry. The register union
                # is idempotent, so even the batch-id guard is belt-and-
                # braces here — a replayed batch folds to the same sketch.
                from ..functions.incremental import (
                    group_distinct_sketch,
                    merge_distinct_sketches,
                )

                ntable = f"{rule.target_name}_ndv"
                if (
                    batch_id is None
                    or self.store.last_batch_id(ntable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    bsk = group_distinct_sketch(
                        obs, list(rule.stats_group_columns),
                        rule.stats_distinct_column,
                    )
                    prev_sk = self.store.read(self.spark, ntable)
                    self.store.publish(
                        merge_distinct_sketches(
                            prev_sk, bsk, list(rule.stats_group_columns)
                        ),
                        ntable, batch_id=batch_id,
                    )
            if rule.stats_group_columns and rule.stats_quantile_column:
                # mergeable quantile-sketch maintenance: log-bucket counts
                # add, so the fold is algebraic like group_stats — and like
                # it, NOT idempotent, hence the same batch-id guard.
                from ..functions.incremental import (
                    group_quantile_sketch,
                    merge_quantile_sketches,
                )

                qtable = f"{rule.target_name}_qsk"
                if (
                    batch_id is None
                    or self.store.last_batch_id(qtable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    bq = group_quantile_sketch(
                        obs, list(rule.stats_group_columns),
                        rule.stats_quantile_column,
                    )
                    prev_q = self.store.read(self.spark, qtable)
                    self.store.publish(
                        merge_quantile_sketches(
                            prev_q, bq, list(rule.stats_group_columns)
                        ),
                        qtable, batch_id=batch_id,
                    )
            if rule.stats_group_columns and rule.stats_topk_column:
                # mergeable Count-Min heavy-hitters maintenance: counters
                # add (batch-id-guarded like group_stats — addition is not
                # idempotent); <table>_topk re-ranks (standing candidates
                # UNION batch distinct values) by the merged sketch, so
                # the candidate set a sketch alone can't enumerate is
                # maintained in O(|groups|*m + |batch distinct|).
                from ..functions.incremental import (
                    group_freq_sketch,
                    merge_freq_sketches,
                    topk_candidates,
                )

                ctable = f"{rule.target_name}_cms"
                ttable = f"{rule.target_name}_topk"
                if (
                    batch_id is None
                    or self.store.last_batch_id(ctable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    bc = group_freq_sketch(
                        obs, list(rule.stats_group_columns),
                        rule.stats_topk_column,
                    )
                    prev_c = self.store.read(self.spark, ctable)
                    merged_c = merge_freq_sketches(
                        prev_c, bc, list(rule.stats_group_columns)
                    )
                    self.store.publish(merged_c, ctable, batch_id=batch_id)
                    cand = topk_candidates(
                        self.store.read(self.spark, ttable),
                        obs,
                        self.store.read(self.spark, ctable),
                        list(rule.stats_group_columns),
                        rule.stats_topk_column,
                    )
                    self.store.publish(cand, ttable, batch_id=batch_id)
            if rule.stats_group_columns and rule.stats_sample_column:
                # mergeable KMV uniform-sample maintenance: min-of-union
                # folds, so the merge is idempotent — like the HLL table,
                # the batch-id guard here is belt-and-braces, not load-
                # bearing. <table>_sample keeps the k smallest-hashed
                # distinct values per group (uniform sample + an oracle-
                # replayable NDV estimator).
                from ..functions.incremental import (
                    group_sample_sketch,
                    merge_sample_sketches,
                )

                mtable = f"{rule.target_name}_sample"
                if (
                    batch_id is None
                    or self.store.last_batch_id(mtable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    bm = group_sample_sketch(
                        obs, list(rule.stats_group_columns),
                        rule.stats_sample_column,
                    )
                    prev_m = self.store.read(self.spark, mtable)
                    self.store.publish(
                        merge_sample_sketches(
                            prev_m, bm, list(rule.stats_group_columns)
                        ),
                        mtable, batch_id=batch_id,
                    )
            if rule.stats_bloom_column:
                # standing Bloom membership bitset over every value this
                # table has ever ingested: bit_or folding is idempotent
                # (like the KMV sample), so the guard is belt-and-braces;
                # a probe miss certifies "never seen" in O(1) with zero
                # reads of the target
                from ..functions.membership import (
                    bloom_from_hashes,
                    merge_blooms,
                )

                btable = f"{rule.target_name}_bloom"
                if (
                    batch_id is None
                    or self.store.last_batch_id(btable) != batch_id
                ):
                    obs = (
                        parsed.filter(F.col("op") != "d")
                        if "op" in parsed.columns else parsed
                    )
                    vals = obs.select(
                        F.col(rule.stats_bloom_column).cast("long").alias("v")
                    ).filter(F.col("v").isNotNull())
                    bb = bloom_from_hashes(vals, "v")
                    prev_b = self.store.read(self.spark, btable)
                    self.store.publish(
                        bb if prev_b is None else merge_blooms(prev_b, bb),
                        btable, batch_id=batch_id,
                    )
            if rule.dedup_ingest or rule.bm25_ingest or rule.ann_ingest:
                # CDC-correct ingest feed for the derived-state family:
                # the batch's LWW-LATEST image per key (a micro-batch
                # routinely carries several images of one pk — only the
                # final state may index), plus the batch's updated/
                # deleted keys as TOMBSTONES (an update is delete+insert
                # for per-doc derived state: the old postings/bands/
                # vectors die, the new image re-indexes in this same
                # batch). All three ingests apply the merge-on-read
                # tombstone pattern (streaming/tombstones.py); replay-
                # idempotent via each log's committed-batch manifest.
                images = lww_dedup(parsed, list(rule.primary_key), order)
                has_op = "op" in images.columns
                docs = (
                    images.filter(F.col("op") != "d") if has_op else images
                )
                tombs = (
                    images.filter(F.col("op").isin("u", "d"))
                    .select(rule.primary_key[0])
                    if has_op else None
                )
                if rule.dedup_ingest:
                    # streaming near-dup ingest (streaming/dedup_ingest):
                    # deduped against the LIVE standing corpus (doc-free:
                    # persisted band index + sketches) and within itself,
                    # then folded into the corpus state
                    self._dedup_ingestor(rule).process_batch(
                        docs, batch_id, tombstones=tombs
                    )
                if rule.bm25_ingest:
                    # streaming BM25 ingest (streaming/retrieval_ingest):
                    # postings append O(|batch|), the corpus never
                    # re-tokenized; churn rides the tombstone fold
                    self._bm25_ingestor(rule).process_batch(
                        docs, batch_id, tombstones=tombs
                    )
                if rule.ann_ingest:
                    # streaming ANN ingest (streaming/ann_ingest.py):
                    # assign the batch's vectors against the persisted
                    # centroids and append to the standing IVF index —
                    # O(|batch| x k), the corpus never re-assigned. The
                    # first batch bootstraps the centroids; drift
                    # rebuilds ride the maintenance cycle.
                    self._ann_ingestor(rule).process_batch(
                        docs.select(
                            rule.primary_key[0], rule.ann_vec_column
                        ),
                        batch_id, tombstones=tombs,
                    )
            if rule.save_delete or rule.only_save_delete:
                dels = latest_deletes(parsed, list(rule.primary_key), order)
                dtable = f"{rule.target_name}_delete"  # redshift_sink.py:242-253
                # the delete log is pure append under BOTH store modes:
                # O(|batch|) written, replay-guarded by the append manifest
                # + the fold-spanning base-pointer guard — never the old
                # O(|deletes-ever|) read-union-dedup-republish. Accrued
                # delta dirs fold into the base in the maintenance cycle.
                self.store.publish_append(dels, dtable, batch_id)
            return TaskStatus(rule.target_name, "finished", rows=n)
        except Exception as e:  # noqa: BLE001 - reported to fail-fast logic
            return TaskStatus(rule.target_name, "error", error=repr(e))

    # -- batch loop --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int,
                      *, batch_timeout_sec: float | None = None) -> list[TaskStatus]:
        if batch_df.isEmpty():
            self.batch_statuses.append([])
            return []
        batch_df = batch_df.persist()
        group = f"cdc-batch-{batch_id}"
        pool = cf.ThreadPoolExecutor(max_workers=self.max_workers)
        try:
            batch_df.count()  # materialize the cache once for all tasks
            # one routing census for all rules (multi-rule fan-outs only:
            # with a single rule the census job would just replace the
            # one probe job it saves)
            route_counts = (
                self._batch_route_counts(batch_df)
                if len(self.rules) > 1 else None
            )
            futs = [
                pool.submit(
                    self._run_table, batch_df, rule, group, batch_id,
                    route_counts,
                )
                for rule in self.rules
            ]
            try:
                statuses = [
                    f.result()
                    for f in cf.as_completed(futs, timeout=batch_timeout_sec)
                ]
            except TimeoutError:
                # watchdog ABORT (T8): cancel the Spark jobs tagged with
                # this batch's job group so the hung actions actually stop,
                # and drop the pool WITHOUT waiting — a plain context-exit
                # would block in shutdown(wait=True) behind the stuck task,
                # reducing the timeout to a report instead of a bound
                self.spark.sparkContext.cancelJobGroup(group)
                pool.shutdown(wait=False, cancel_futures=True)
                raise RuntimeError(
                    f"batch {batch_id} exceeded batch_timeout_sec="
                    f"{batch_timeout_sec}; spark jobs cancelled"
                ) from None
            pool.shutdown(wait=True)
        finally:
            pool.shutdown(wait=False)  # idempotent; covers non-timeout errors
            batch_df.unpersist()
        errors = [s for s in statuses if s.status == "error"]
        self.batch_statuses.append(statuses)
        if errors:
            raise RuntimeError(f"batch {batch_id} failed: {errors}")
        self._maybe_compact()
        self._maybe_fold_backstop()
        self._maybe_prune_versions()
        return statuses

    def _maybe_prune_versions(self) -> None:
        """Version-chain retention, enforced after EVERY successful batch
        (not just the compaction cycle — a job with no compaction cadence
        configured must still not grow a full-corpus copy per publish).
        The prune itself is a driver-side listdir + rmtree of at most the
        few directories the last batch added, so per-batch cost is
        negligible next to the publish it trails; keep >= 2 leaves the
        previous version for any reader that resolved the pointer just
        before the flip (store.prune_versions' contract). A prune error
        is maintenance, not data loss: recorded and retried next batch."""
        if self.keep_versions is None:
            return

        def prune(t: str) -> None:
            try:
                # upgrade loudness (r11 ADVICE): a job that accrued a long
                # version chain under the old keep-all default starts
                # deleting replay/audit history on its first prune after
                # an upgrade — say so ONCE per table, before it happens,
                # with the opt-out spelled out. A steadily-pruned chain
                # holds at most keep+1 dirs when the prune runs, so a
                # longer chain here is pre-existing history.
                if t not in self._prune_warned:
                    self._prune_warned.add(t)
                    if hasattr(self.store, "versions_on_disk"):
                        chain = len(self.store.versions_on_disk(t))
                        if chain > self.keep_versions + 1:
                            import logging

                            logging.getLogger(__name__).warning(
                                "retention: table %r has %d version dirs "
                                "(pre-existing history); keep_versions=%d "
                                "will prune all but the newest %d (plus a "
                                "%.0fs grace window). Set "
                                "keep_versions='all' to keep every "
                                "version for replay audits.",
                                t, chain, self.keep_versions,
                                self.keep_versions, self.prune_grace_sec,
                            )
                # spark is passed EXPLICITLY: this runs on pool worker
                # threads where getActiveSession() is None (thread-local
                # through py4j), which silently skipped the bucketed
                # store's catalog cleanup (r11 ADVICE)
                self.store.prune_versions(
                    t, keep=self.keep_versions,
                    min_age_sec=self.prune_grace_sec, spark=self.spark,
                )
            except Exception as e:  # noqa: BLE001 - maintenance only
                self.compact_errors.append((t, repr(e)))

        # concurrent like the other maintenance: at wide fan-outs the
        # rmtree of a full copy-on-write version dir per table is the
        # cost, and the dirs are disjoint
        self._for_each_table(prune, self._maintained_tables())

    def _maintained_tables(self) -> list[str]:
        """Every table the rules can actually have created — the target
        plus only the suffix tables the rule's flags enable (the same
        conditions _maybe_compact applies). At a 100-rule fan-out the
        unconditional 4-per-rule enumeration queued 300 no-op
        maintenance tasks per batch against tables that cannot exist."""
        out: list[str] = []
        for rule in self.rules:
            out.append(rule.target_name)
            if rule.save_delete or rule.only_save_delete:
                out.append(f"{rule.target_name}_delete")
            if rule.scd2_history:
                out.append(f"{rule.target_name}_history")
            if rule.quality_gate:
                out.append(f"{rule.target_name}_rejected")
        return out

    def _maybe_fold_backstop(self) -> None:
        """Fold any table whose unfolded delta count reached
        `max_deltas_before_fold` — the cadence-independent cap on
        merge-on-read / append-log read amplification. A fold error is
        maintenance, not data loss: recorded and retried next batch, like
        compaction."""
        cap = self.max_deltas_before_fold
        if not cap or not hasattr(self.store, "delta_count"):
            return

        def fold(t: str) -> None:
            try:
                if self.store.delta_count(t) >= cap:
                    self.store.fold_deltas(self.spark, t)
            except Exception as e:  # noqa: BLE001 - maintenance only
                self.compact_errors.append((t, repr(e)))

        self._for_each_table(fold, self._maintained_tables())

    def _for_each_table(self, fn, tables) -> None:
        """Run independent per-table maintenance CONCURRENTLY on the
        processor's pool width. The r11 fan-out probe measured the
        serial per-table fold tail at 18.5 s of a 45.6 s wall (40%)
        for 30 merge-on-read tables — at the reference's ~100-rule
        shape a serial maintenance loop walls O(tables), while each
        table's fold/compact is an independent Spark job that local[*]
        (or a cluster) overlaps fine. Distinct tables touch disjoint
        directories/manifests, so concurrency is safe by construction;
        `fn` must record its own errors (maintenance never fails the
        batch)."""
        # dedupe identical items while preserving order (two rules
        # sharing a target must not maintain the same table
        # concurrently). NOTE: this is item-level — callers passing
        # non-string items must dedupe by TABLE NAME themselves
        # (_maybe_compact does: its (table, zcols) tuples can differ
        # while naming the same table; r11 ADVICE)
        tables = list(dict.fromkeys(tables))
        if len(tables) <= 1:
            for t in tables:
                fn(t)
            return
        with cf.ThreadPoolExecutor(
            max_workers=min(self.max_workers, len(tables))
        ) as pool:
            list(pool.map(fn, tables))

    def _maybe_compact(self) -> None:
        if not self.compact_every_n_batches:
            return
        self._batches_since_compact += 1
        if self._batches_since_compact < self.compact_every_n_batches:
            return
        self._batches_since_compact = 0
        from ..operators.layout import compact_table

        # gather every rule's maintainable tables first, then fold/compact
        # them CONCURRENTLY (pool-wide): each is an independent Spark job
        # over its own directories, and the r11 fan-out probe showed the
        # serial loop dominating maintenance wall at wide fan-outs
        all_tables: list[tuple[str, tuple]] = []
        for rule in self.rules:
            # (table, clustering): the delete log is append-only event data
            # — size-compact it, but only the keyed target gets the rule's
            # z-order clustering restored
            all_tables.append((rule.target_name, tuple(rule.zorder_columns)))
            if rule.save_delete or rule.only_save_delete:
                all_tables.append((f"{rule.target_name}_delete", ()))
            if rule.scd2_history:
                # the history accrues per-batch state too (file-sets under
                # copy-on-write, deltas under merge-on-read) — same cycle
                all_tables.append((f"{rule.target_name}_history", ()))
            if rule.quality_gate:
                # the quarantine appends one delta per batch under both
                # store modes — without a fold its read cost grows without
                # bound, exactly like the delete log
                all_tables.append((f"{rule.target_name}_rejected", ()))

        # dedupe by TABLE NAME, not by (table, zcols) item (r11 ADVICE):
        # _for_each_table's generic dedupe is on the full item, so two
        # rules sharing a target_name with different zorder_columns — or
        # a target colliding with another rule's _delete/_history suffix
        # table — would fold/compact the same table concurrently, racing
        # its manifest/version pointer. The FIRST rule's clustering wins
        # — a deliberate choice where the old serial loop compacted the
        # table once per rule and the LAST rule's clustering happened to
        # stick (an accident of iteration order, never a contract);
        # first-wins at least makes the winner the rule a config reader
        # sees first.
        seen_tables: dict[str, tuple] = {}
        for t, zcols in all_tables:
            seen_tables.setdefault(t, zcols)
        all_tables = list(seen_tables.items())

        def maintain(item: tuple[str, tuple]) -> None:
            t, zcols = item
            # maintenance must not fail a batch whose data work already
            # committed: a transient compaction error is recorded, not
            # raised (the next cycle retries it). Non-transient
            # zorder_columns misconfiguration never lands here:
            # compact_table degrades it to size-only compaction with a
            # warning, so small files cannot accrue indefinitely.
            try:
                if hasattr(self.store, "fold_deltas"):
                    # merge-on-read: materialize base from the
                    # accumulated deltas first, then size/cluster-
                    # compact the fresh base like any other table
                    self.store.fold_deltas(self.spark, t)
                compact_table(
                    self.store, self.spark, t,
                    target_bytes=self.compact_target_bytes,
                    zorder_cols=list(zcols) or None,
                )
            except Exception as e:  # noqa: BLE001
                self.compact_errors.append((t, repr(e)))

        self._for_each_table(maintain, all_tables)

        def maintain_ingestors(rule: SyncRule) -> None:
            # one serial chain PER RULE (maintain may swap the version
            # compact_state then folds), run concurrently ACROSS rules —
            # each rule's ingestors own disjoint AppendLog state, the
            # same independence the per-table loop above exploits
            if rule.ann_ingest:
                # the drift loop rides the same maintenance economics as
                # re-clustering: measure, and rebuild+swap only when the
                # size-weighted centroid similarity fell below the rule's
                # floor (streaming/ann_ingest.VersionedAnnIndex.maintain)
                try:
                    self._ann_ingestor(rule).maintain(self.spark)
                except Exception as e:  # noqa: BLE001
                    self.compact_errors.append(
                        (f"{rule.target_name}_ann_index", repr(e))
                    )
            # AppendLog-backed operator state accrues one directory per
            # ingested batch; the same maintenance cycle segment-merges it
            # (AppendLog.compact keeps the committed-batch ids, so replay
            # skipping survives — the r5 compaction-vs-replay lesson)
            for flag, getter, label in (
                (rule.dedup_ingest, self._dedup_ingestor, "_dedup_state"),
                (rule.bm25_ingest, self._bm25_ingestor, "_bm25_state"),
                (rule.ann_ingest, self._ann_ingestor, "_ann_state"),
            ):
                if not flag:
                    continue
                try:
                    getter(rule).compact_state(self.spark)
                except Exception as e:  # noqa: BLE001
                    self.compact_errors.append(
                        (f"{rule.target_name}{label}", repr(e))
                    )

        ingest_rules = [
            r for r in self.rules
            if r.ann_ingest or r.dedup_ingest or r.bm25_ingest
        ]
        self._for_each_table(maintain_ingestors, ingest_rules)


def run_file_stream(
    spark: SparkSession,
    source_dir: str,
    processor: CdcBatchProcessor,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    batch_timeout_sec: float | None = None,
):
    """Bounded (availableNow, T2) or continuous (processingTime, T1) stream
    over a directory of JSON-lines files with checkpointed recovery (T3).
    Same contract as the Kafka source: one `value: string` column.
    `max_files_per_trigger` is the file-source analog of the Kafka
    `maxOffsetsPerTrigger` rate limit (T4): it bounds each micro-batch."""
    reader = spark.readStream.schema("value string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(source_dir).toDF("value")
    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: processor.process_batch(
                df, bid, batch_timeout_sec=batch_timeout_sec
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time or "30 seconds")
    return writer.start()
