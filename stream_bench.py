#!/usr/bin/env python
"""CDC streaming throughput bench: drive the full streaming shell
(file-backed micro-batches -> route -> parse -> LWW dedup -> merge into the
keyed parquet target, N tables fanned out per batch) and report sustained
records/second.

The reference's published envelope is 1,000,000 records per 30 s trigger
(~33,333 rec/s sustained ceiling — BASELINE.md) across a wide multi-table
fan-out (~100 sync rules in its shipped configs). This bench measures the
same quantity for this engine: multiplexed Debezium envelopes at
$SPARK_GRAFT_SF_DIR, split into several micro-batches via the file-source
rate limit (the `maxFilesPerTrigger` analog of `maxOffsetsPerTrigger`).

Fan-out knobs:
  SPARK_GRAFT_STREAM_TABLES   rules per batch (default 2). Counts above 2
                              alias the same source tables to distinct
                              targets (target_table override) — each rule
                              is a full independent route->parse->dedup->
                              merge task over the shared cached batch,
                              exactly the reference's multi-rule shape
                              (T10), so per-batch work scales with the
                              rule count while the topic scan is paid once.
  SPARK_GRAFT_STREAM_FANOUT   comma list (e.g. "2,10,30"): run BOTH store
                              modes at each fan-out and emit a "fanout"
                              map alongside the headline record.
  SPARK_GRAFT_STREAM_DISJOINT comma list (e.g. "10,30,100"): TRUE-ROUTING
                              sweep — the topic's records route
                              DISJOINTLY across N rules (each record
                              matches exactly ONE rule, the reference's
                              ~100-table job-4x shape), so total data
                              work is CONSTANT in N and the measurement
                              isolates per-rule shell overhead (routing
                              census, per-table merge jobs, maintenance).
                              Contrast with SPARK_GRAFT_STREAM_FANOUT's
                              aliasing mode, where every rule reprocesses
                              the whole topic (an N/2-fold work
                              multiplier that the reference's disjoint
                              routing never pays).
  SPARK_GRAFT_STREAM_WORKERS  processor thread-pool width (default 8;
                              widening to the rule count measured SLOWER
                              at fan-out 30 on one JVM — the knob is for
                              cluster-shaped probes).

Prints ONE JSON line:
  {"metric": "cdc_stream_records_per_sec", "value": N,
   "unit": "records/sec", "records": R, "wall_sec": S, "batches": B,
   "mor_records_per_sec": M, "tables": T,
   ["fanout": {"10": {"cow": .., "mor": ..}, ...},]
   "baseline_records_per_sec": 33333, "sf": ...}

Topic synthesis and session startup are excluded from the timed window
(a real deployment reads ready-made bytes from Kafka).

The topic is split into files ARBITRARILY (round-robin), so per-key event
order across micro-batches is not preserved — fine for a throughput
measurement (identical compute shape), but final-state equality needs
per-key-ordered delivery, which in production is Kafka's contract (topic
keyed by pk). See tests/test_streaming.py for the ordered-delivery
correctness path and streaming.seen_keys_dedup for the unordered guard.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_redshift_spark.config import SyncRule  # noqa: E402
from kafka_cdc_redshift_spark.session import build_session  # noqa: E402
from kafka_cdc_redshift_spark.sources import load_table  # noqa: E402
from kafka_cdc_redshift_spark.sources.envelopes import synth_debezium_topic  # noqa: E402
from kafka_cdc_redshift_spark.streaming import (  # noqa: E402
    CdcBatchProcessor,
    MergeOnReadTargetStore,
    ParquetTargetStore,
    run_file_stream,
)

N_FILES = 8
FILES_PER_TRIGGER = 2  # -> 4 micro-batches

_BASES = (
    ("orders", ("o_orderkey",)),
    ("customer", ("c_custkey",)),
)


def _rules_and_schemas(spark, sf_dir, n_tables: int):
    """`n_tables` sync rules over the same two source tables: extra rules
    alias a source to a distinct target_table, so every rule runs the full
    per-table task (route -> parse -> dedup -> merge) against its own
    target while the batch cache is shared — the reference's wide
    multi-rule fan-out shape without needing n distinct topics."""
    base_schema = {
        t: load_table(spark, sf_dir, t).schema for t, _ in _BASES
    }
    rules, schemas = [], {}
    for i in range(n_tables):
        table, pk = _BASES[i % len(_BASES)]
        target = table if i < len(_BASES) else f"{table}_t{i}"
        rules.append(
            SyncRule(db="salesdb", table=table, primary_key=pk,
                     target_table=None if i < len(_BASES) else target)
        )
        schemas[target] = base_schema[table]
    return rules, schemas


def _disjoint_topic_and_rules(spark, sf_dir, n: int):
    """True-routing shape: one multiplexed topic whose every record
    belongs to exactly ONE of `n` tables (`orders_p{i}`, i = o_orderkey
    mod n — deterministic, so a key's whole changelog routes to one
    table and LWW ordering is preserved), plus the n matching sync
    rules. Total record count is independent of n: sweeping n measures
    the SHELL's per-rule overhead at constant data work, the regime the
    reference's ~100-disjoint-table configs run in
    (config/job-4x.properties:31-134)."""
    from pyspark.sql import functions as F

    from kafka_cdc_redshift_spark.sources.envelopes import (
        ORDERS_COLS,
        synth_orders_changelog,
    )

    cl = synth_orders_changelog(spark, sf_dir)
    part = F.pmod(F.col("o_orderkey"), F.lit(n)).cast("int")
    table_name = F.concat(F.lit("orders_p"), part)
    row = F.struct(*[F.col(c) for c in ORDERS_COLS])
    topic = cl.select(
        F.to_json(
            F.struct(
                F.when(F.col("op") == "d", row).otherwise(F.lit(None)).alias("before"),
                F.when(F.col("op") != "d", row).otherwise(F.lit(None)).alias("after"),
                F.struct(
                    F.lit("salesdb").alias("db"),
                    table_name.alias("table"),
                    F.col("ts_ms").alias("ts_ms"),
                ).alias("source"),
                F.col("op"),
                F.col("ts_ms"),
            )
        ).alias("value")
    )
    base_schema = load_table(spark, sf_dir, "orders").schema
    rules = [
        SyncRule(db="salesdb", table=f"orders_p{i}",
                 primary_key=("o_orderkey",))
        for i in range(n)
    ]
    schemas = {f"orders_p{i}": base_schema for i in range(n)}
    return topic, rules, schemas


def _timed_run(spark, work, topic_dir, rules, schemas, store, tag,
               fold_after: bool) -> tuple[float, int]:
    # default stays 8: a 30-wide pool was MEASURED slower at fan-out 30
    # on one JVM (4.5k vs 6.1k rec/s) — driver-side contention, not pool
    # queueing, binds first; the knob exists for cluster-shaped probes
    workers = int(os.environ.get("SPARK_GRAFT_STREAM_WORKERS", "8"))
    proc = CdcBatchProcessor(
        spark, rules, store, payload_schemas=schemas, max_workers=workers,
    )
    t0 = time.perf_counter()
    q = run_file_stream(
        spark, topic_dir, proc, os.path.join(work, f"ckpt_{tag}"),
        max_files_per_trigger=FILES_PER_TRIGGER,
    )
    q.awaitTermination()
    if fold_after:
        # include one final fold so the merge-on-read number covers the
        # full (amortized) cost of materializing the same final tables —
        # concurrently across tables, exactly like the processor's own
        # maintenance cycle (the r11 fan-out probe measured the SERIAL
        # tail at 18.5 s of a 45.6 s wall for 30 tables)
        proc._for_each_table(
            lambda t: store.fold_deltas(spark, t),
            [r.target_name for r in rules],
        )
    wall = time.perf_counter() - t0
    batches = len([b for b in proc.batch_statuses if b])
    err = [s for b in proc.batch_statuses for s in b if s.status == "error"]
    if err:
        raise RuntimeError(f"{tag}: {err}")
    return wall, batches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_tables = int(os.environ.get("SPARK_GRAFT_STREAM_TABLES", "2"))
    sweep = [
        int(x) for x in
        os.environ.get("SPARK_GRAFT_STREAM_FANOUT", "").split(",") if x
    ]
    spark = build_session("stream_bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        topic_dir = os.path.join(work, "topic")
        topic = synth_debezium_topic(spark, sf_dir)
        n_records = topic.count()
        topic.repartition(N_FILES).write.mode("overwrite").text(topic_dir)

        def run_pair(n: int, tag: str):
            rules, schemas = _rules_and_schemas(spark, sf_dir, n)
            cow_wall, batches = _timed_run(
                spark, work, topic_dir, rules, schemas,
                ParquetTargetStore(os.path.join(work, f"store_{tag}")),
                f"cow_{tag}", fold_after=False,
            )
            mor_wall, _ = _timed_run(
                spark, work, topic_dir, rules, schemas,
                MergeOnReadTargetStore(os.path.join(work, f"mor_{tag}")),
                f"mor_{tag}", fold_after=True,
            )
            return cow_wall, mor_wall, batches

        cow_wall, mor_wall, batches = run_pair(n_tables, f"main{n_tables}")
        record = {
            "metric": "cdc_stream_records_per_sec",
            "value": round(n_records / cow_wall, 1),
            "unit": "records/sec",
            "records": n_records,
            "wall_sec": round(cow_wall, 2),
            "batches": batches,
            "mor_records_per_sec": round(n_records / mor_wall, 1),
            "mor_wall_sec": round(mor_wall, 2),
            "tables": n_tables,
            "baseline_records_per_sec": 33333,
            "sf": float(sf),
        }
        if sweep:
            record["fanout"] = {}
            for n in sweep:
                if n == n_tables:
                    cw, mw = cow_wall, mor_wall
                else:
                    cw, mw, _ = run_pair(n, f"sweep{n}")
                record["fanout"][str(n)] = {
                    "cow_records_per_sec": round(n_records / cw, 1),
                    "mor_records_per_sec": round(n_records / mw, 1),
                }
        disjoint = [
            int(x) for x in
            os.environ.get("SPARK_GRAFT_STREAM_DISJOINT", "").split(",") if x
        ]
        if disjoint:
            record["disjoint"] = {}
            for n in disjoint:
                dj_topic, dj_rules, dj_schemas = _disjoint_topic_and_rules(
                    spark, sf_dir, n
                )
                dj_dir = os.path.join(work, f"dj_topic_{n}")
                dj_records = dj_topic.count()
                dj_topic.repartition(N_FILES).write.mode("overwrite").text(dj_dir)
                cw, _b = _timed_run(
                    spark, work, dj_dir, dj_rules, dj_schemas,
                    ParquetTargetStore(os.path.join(work, f"dj_cow_{n}")),
                    f"dj_cow_{n}", fold_after=False,
                )
                mw, _b = _timed_run(
                    spark, work, dj_dir, dj_rules, dj_schemas,
                    MergeOnReadTargetStore(os.path.join(work, f"dj_mor_{n}")),
                    f"dj_mor_{n}", fold_after=True,
                )
                record["disjoint"][str(n)] = {
                    "records": dj_records,
                    "cow_records_per_sec": round(dj_records / cw, 1),
                    "mor_records_per_sec": round(dj_records / mw, 1),
                }
        print(json.dumps(record))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
