#!/usr/bin/env python
"""CDC streaming throughput bench: drive the full streaming shell
(file-backed micro-batches -> route -> parse -> LWW dedup -> merge into the
keyed parquet target, two tables fanned out per batch) and report sustained
records/second.

The reference's published envelope is 1,000,000 records per 30 s trigger
(~33,333 rec/s sustained ceiling — BASELINE.md). This bench measures the
same quantity for this engine: multiplexed Debezium envelopes at
$SPARK_GRAFT_SF_DIR, split into several micro-batches via the file-source
rate limit (the `maxFilesPerTrigger` analog of `maxOffsetsPerTrigger`).

Prints ONE JSON line:
  {"metric": "cdc_stream_records_per_sec", "value": N,
   "unit": "records/sec", "records": R, "wall_sec": S, "batches": B,
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("stream_bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        topic_dir = os.path.join(work, "topic")
        topic = synth_debezium_topic(spark, sf_dir)
        n_records = topic.count()
        topic.repartition(N_FILES).write.mode("overwrite").text(topic_dir)

        rules = [
            SyncRule(db="salesdb", table="orders", primary_key=("o_orderkey",)),
            SyncRule(db="salesdb", table="customer", primary_key=("c_custkey",)),
        ]
        schemas = {
            "orders": load_table(spark, sf_dir, "orders").schema,
            "customer": load_table(spark, sf_dir, "customer").schema,
        }
        proc = CdcBatchProcessor(
            spark,
            rules,
            ParquetTargetStore(os.path.join(work, "store")),
            payload_schemas=schemas,
            max_workers=4,
        )

        t0 = time.perf_counter()
        q = run_file_stream(
            spark,
            topic_dir,
            proc,
            os.path.join(work, "ckpt"),
            max_files_per_trigger=FILES_PER_TRIGGER,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = len([b for b in proc.batch_statuses if b])

        # merge-on-read mode: the SAME stream over MergeOnReadTargetStore —
        # each batch appends an O(|batch|) delta instead of rewriting the
        # target, with resolution deferred to read/fold. Timed window
        # includes one final fold_deltas so the comparison covers the full
        # (amortized) cost of materializing the same final table.
        mor_store = MergeOnReadTargetStore(os.path.join(work, "mor_store"))
        mor_proc = CdcBatchProcessor(
            spark, rules, mor_store, payload_schemas=schemas, max_workers=4
        )
        t0 = time.perf_counter()
        q = run_file_stream(
            spark,
            topic_dir,
            mor_proc,
            os.path.join(work, "ckpt_mor"),
            max_files_per_trigger=FILES_PER_TRIGGER,
        )
        q.awaitTermination()
        for r in rules:
            mor_store.fold_deltas(spark, r.target_name)
        mor_wall = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "cdc_stream_records_per_sec",
                    "value": round(n_records / wall, 1),
                    "unit": "records/sec",
                    "records": n_records,
                    "wall_sec": round(wall, 2),
                    "batches": batches,
                    "mor_records_per_sec": round(n_records / mor_wall, 1),
                    "mor_wall_sec": round(mor_wall, 2),
                    "baseline_records_per_sec": 33333,
                    "sf": float(sf),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
