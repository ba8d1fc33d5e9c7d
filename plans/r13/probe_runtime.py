#!/usr/bin/env python
"""Per-query runtime decomposition probe (optimization round evidence).

For each query: time the Python DataFrame build (captures eager setup
jobs like localCheckpoint/collect barriers), then the count() action,
and record how many Spark jobs/stages each phase submitted (job-group
scoped — exact counts, immune to host noise).

Usage: python plans/r13/probe_runtime.py [name ...] (default: all)
Writes JSON lines to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from kafka_cdc_redshift_spark.plans import SPECS  # noqa: E402
from kafka_cdc_redshift_spark.plans.catalog import warm_fixtures  # noqa: E402
from kafka_cdc_redshift_spark.session import build_session  # noqa: E402


def jobs_stages(tracker, group):
    jids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    for j in jids:
        info = tracker.getJobInfo(j)
        if info is not None:
            n_stages += len(info.stageIds)
    return len(jids), n_stages


def main() -> None:
    names = sys.argv[1:] or sorted(SPECS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("probe_runtime")
    sc = spark.sparkContext
    # same warmups as bench.py so one-time costs don't land on query 1
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()
    warm_fixtures(spark, sf_dir)
    tracker = sc.statusTracker()
    out = []
    for name in names:
        rec = {"q": name}
        g = f"probe-build-{name}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        df = SPECS[name].spark(spark, sf_dir)
        rec["t_build"] = round(time.perf_counter() - t0, 3)
        rec["build_jobs"], rec["build_stages"] = jobs_stages(tracker, g)
        g = f"probe-exec-{name}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        df.count()
        rec["t_exec"] = round(time.perf_counter() - t0, 3)
        rec["exec_jobs"], rec["exec_stages"] = jobs_stages(tracker, g)
        # second pass over a FRESH build: steady-state (fixtures/state warm)
        g = f"probe-build2-{name}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        df = SPECS[name].spark(spark, sf_dir)
        rec["t_build2"] = round(time.perf_counter() - t0, 3)
        rec["build2_jobs"], _ = jobs_stages(tracker, g)
        g = f"probe-exec2-{name}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        df.count()
        rec["t_exec2"] = round(time.perf_counter() - t0, 3)
        rec["exec2_jobs"], rec["exec2_stages"] = jobs_stages(tracker, g)
        sc.setJobGroup("probe-idle", "idle")
        print(json.dumps(rec), flush=True)
        out.append(rec)
    spark.stop()


if __name__ == "__main__":
    main()
