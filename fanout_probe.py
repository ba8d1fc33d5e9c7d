#!/usr/bin/env python
"""Fan-out decay attribution probe (r10 verdict item #5).

stream_bench.py shows both store modes converging to ~7k rec/s at 30
concurrent tables (vs ~26-32k at 2). This probe runs the SAME shell
with three instruments to say WHERE the decay comes from:

  * per-rule task seconds (`CdcBatchProcessor._run_table` wrapped) —
    the same base rule ("orders", identical work) exists at every
    fan-out, so its task-time inflation isolates CONTENTION from the
    extra work the aliased rules add;
  * store publish seconds (publish / publish_delta wrapped) — the
    fraction of task time spent in the store write path, and whether
    that fraction grows with fan-out (publish serialization);
  * pool efficiency = sum(task seconds) / (wall x pool width) — how
    much of the decay is simply the thread pool saturating on 15x the
    merge work (each aliased rule runs the FULL route->parse->dedup->
    merge task; records/s divides by design when total work scales).

Prints one JSON line per (mode, fanout) and a final summary line.
Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python fanout_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_redshift_spark.session import build_session  # noqa: E402
from kafka_cdc_redshift_spark.sources.envelopes import (  # noqa: E402
    synth_debezium_topic,
)
from kafka_cdc_redshift_spark.streaming import (  # noqa: E402
    CdcBatchProcessor,
    MergeOnReadTargetStore,
    ParquetTargetStore,
    run_file_stream,
)
from stream_bench import (  # noqa: E402
    FILES_PER_TRIGGER,
    N_FILES,
    _disjoint_topic_and_rules,
    _rules_and_schemas,
)

_lock = threading.Lock()
_task_secs: dict[str, list] = defaultdict(list)  # target -> [sec, ...]
_publish_secs: dict[str, float] = defaultdict(float)  # target -> sec


def _instrument():
    orig_run = CdcBatchProcessor._run_table

    def timed_run(self, batch_df, rule, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_run(self, batch_df, rule, *a, **k)
        finally:
            with _lock:
                _task_secs[rule.target_name].append(
                    time.perf_counter() - t0
                )

    CdcBatchProcessor._run_table = timed_run

    for cls, meth in (
        (ParquetTargetStore, "publish"),
        (MergeOnReadTargetStore, "publish_delta"),
    ):
        orig = getattr(cls, meth)

        def timed_pub(self, df, table, *a, _orig=orig, **k):
            t0 = time.perf_counter()
            try:
                return _orig(self, df, table, *a, **k)
            finally:
                with _lock:
                    _publish_secs[table] += time.perf_counter() - t0

        setattr(cls, meth, timed_pub)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fanouts = [
        int(x) for x in
        os.environ.get("SPARK_GRAFT_STREAM_FANOUT", "2,10,30").split(",")
    ]
    workers = int(os.environ.get("SPARK_GRAFT_STREAM_WORKERS", "8"))
    _instrument()
    spark = build_session("fanout_probe")
    work = tempfile.mkdtemp(prefix="fanout_probe_")
    rows = []
    try:
        topic_dir = os.path.join(work, "topic")
        topic = synth_debezium_topic(spark, sf_dir)
        n_records = topic.count()
        topic.repartition(N_FILES).write.mode("overwrite").text(topic_dir)

        for n in fanouts:
            rules, schemas = _rules_and_schemas(spark, sf_dir, n)
            for mode, mk in (
                ("cow", ParquetTargetStore),
                ("mor", MergeOnReadTargetStore),
            ):
                _task_secs.clear()
                _publish_secs.clear()
                store = mk(os.path.join(work, f"{mode}_{n}"))
                proc = CdcBatchProcessor(
                    spark, rules, store, payload_schemas=schemas,
                    max_workers=workers,
                )
                t0 = time.perf_counter()
                q = run_file_stream(
                    spark, topic_dir, proc,
                    os.path.join(work, f"ckpt_{mode}_{n}"),
                    max_files_per_trigger=FILES_PER_TRIGGER,
                )
                q.awaitTermination()
                if mode == "mor":
                    for r in rules:
                        store.fold_deltas(spark, r.target_name)
                wall = time.perf_counter() - t0
                err = [s for b in proc.batch_statuses for s in b
                       if s.status == "error"]
                if err:
                    raise RuntimeError(f"{mode}/{n}: {err}")
                task_total = sum(s for v in _task_secs.values() for s in v)
                base = _task_secs.get("orders", [])
                pub_total = sum(_publish_secs.values())
                row = {
                    "mode": mode,
                    "tables": n,
                    "rec_per_sec": round(n_records / wall, 1),
                    "wall_sec": round(wall, 2),
                    "task_secs_total": round(task_total, 2),
                    "pool_eff": round(
                        task_total / (wall * min(workers, n)), 3
                    ),
                    "base_rule_mean_task_sec": round(
                        sum(base) / max(len(base), 1), 3
                    ),
                    "publish_secs_total": round(pub_total, 2),
                    "publish_frac_of_task": round(
                        pub_total / max(task_total, 1e-9), 3
                    ),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        # -- true-routing (disjoint) attribution (r12): constant data
        # work across N, so task-sec inflation + pool-eff isolate the
        # per-(table,batch) FIXED cost (job scheduling, store commit IO)
        # that the wide-fan-out wall is made of on one JVM
        disjoint = [
            int(x) for x in
            os.environ.get("SPARK_GRAFT_PROBE_DISJOINT", "").split(",") if x
        ]
        for n in disjoint:
            dj_topic, dj_rules, dj_schemas = _disjoint_topic_and_rules(
                spark, sf_dir, n
            )
            dj_dir = os.path.join(work, f"dj_topic_{n}")
            dj_records = dj_topic.count()
            dj_topic.repartition(N_FILES).write.mode("overwrite").text(dj_dir)
            for mode, mk in (
                ("cow", ParquetTargetStore),
                ("mor", MergeOnReadTargetStore),
            ):
                _task_secs.clear()
                _publish_secs.clear()
                store = mk(os.path.join(work, f"dj_{mode}_{n}"))
                proc = CdcBatchProcessor(
                    spark, dj_rules, store, payload_schemas=dj_schemas,
                    max_workers=workers,
                )
                t0 = time.perf_counter()
                q = run_file_stream(
                    spark, dj_dir, proc,
                    os.path.join(work, f"ckpt_dj_{mode}_{n}"),
                    max_files_per_trigger=FILES_PER_TRIGGER,
                )
                q.awaitTermination()
                if mode == "mor":
                    proc._for_each_table(
                        lambda t, s=store: s.fold_deltas(spark, t),
                        [r.target_name for r in dj_rules],
                    )
                wall = time.perf_counter() - t0
                err = [s for b in proc.batch_statuses for s in b
                       if s.status == "error"]
                if err:
                    raise RuntimeError(f"dj {mode}/{n}: {err}")
                task_total = sum(s for v in _task_secs.values() for s in v)
                all_tasks = [s for v in _task_secs.values() for s in v]
                pub_total = sum(_publish_secs.values())
                row = {
                    "mode": f"disjoint_{mode}",
                    "tables": n,
                    "rec_per_sec": round(dj_records / wall, 1),
                    "wall_sec": round(wall, 2),
                    "task_secs_total": round(task_total, 2),
                    "pool_eff": round(
                        task_total / (wall * min(workers, n)), 3
                    ),
                    "mean_task_sec": round(
                        task_total / max(len(all_tasks), 1), 3
                    ),
                    "n_tasks": len(all_tasks),
                    "publish_secs_total": round(pub_total, 2),
                    "publish_frac_of_task": round(
                        pub_total / max(task_total, 1e-9), 3
                    ),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        print(json.dumps({
            "metric": "fanout_decay_attribution",
            "records": n_records,
            "workers": workers,
            "rows": rows,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
