#!/usr/bin/env python
"""A/B probe (r13, verdict item 6): cdc_qsketch_current's exact
order-statistic leg evaluates the pruned 3-column orders relation THREE
times through range_partitioned_rank (boundary sampler collect, census
broadcast subtree, main spine). Adjudicated fine at sf0.1 (17 MB of
testdata — per-query cost is job overhead, not bytes); this probe asks
whether a localCheckpoint of the 3-column relation beats the triple scan
when the scan actually costs something, before accepting the shape for
100 TB.

Method: replicate sf0.1 orders x100 (~15M rows, an sf10-equivalent
single-table scan) into /tmp parquet, then time the exact leg both ways
(noop sink, guide §1.4), 3 timed runs each after a warm run, with
job-group-scoped job/stage counts. No catalog query is touched; this is
measurement evidence only.

Usage: python plans/r13/probe_qsketch_ab.py [replication (default 100)]
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kafka_cdc_redshift_spark.session import build_session  # noqa: E402
from kafka_cdc_redshift_spark.util import range_partitioned_rank  # noqa: E402

PROBS = [0.5, 0.9]


def exact_leg(live):
    ranked = range_partitioned_rank(
        live, ["o_orderpriority"], ["v", "o_orderkey"],
        rank_col="rn", n_col="tot",
    )
    pl = F.explode(F.array(*[F.lit(p) for p in PROBS])).alias("p")
    return (
        ranked.select("o_orderpriority", "v", "rn", "tot", pl)
        .filter(
            F.col("rn")
            == F.greatest(
                F.ceil(F.col("p") * F.col("tot")).cast("long"), F.lit(1)
            )
        )
    )


def live_rel(spark, path):
    orders = spark.read.parquet(path)
    return orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderpriority", "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0,
               F.col("o_totalprice") * F.lit(1.1))
        .otherwise(F.col("o_totalprice")).alias("v"),
    )


def jobs_stages(tracker, group):
    jids = tracker.getJobIdsForGroup(group)
    n_stages = sum(
        len(tracker.getJobInfo(j).stageIds)
        for j in jids
        if tracker.getJobInfo(j) is not None
    )
    return len(jids), n_stages


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = f"/tmp/qsketch_ab_orders_x{repl}.parquet"
    spark = build_session("probe_qsketch_ab")
    sc = spark.sparkContext
    if not os.path.exists(big):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        reps = spark.range(repl).select(F.col("id").alias("__rep"))
        (
            orders.crossJoin(reps)
            # keep keys distinct per replica so group sizes scale
            .withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("__rep") * F.lit(10_000_000),
            )
            .drop("__rep")
            .repartition(32)
            .write.mode("overwrite").parquet(big)
        )
    n = spark.read.parquet(big).count()
    tracker = sc.statusTracker()
    out = {"rows": n, "replication": repl}
    for label, mk in (
        ("A_triple_scan", lambda: live_rel(spark, big)),
        ("B_checkpoint",
         lambda: live_rel(spark, big).localCheckpoint(eager=False)),
    ):
        sc.setJobDescription(f"qsketch-ab:{label}:warm")
        exact_leg(mk()).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(3):
            g = f"qab-{label}-{i}"
            sc.setJobGroup(g, label)
            t0 = time.perf_counter()
            exact_leg(mk()).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            out[f"{label}_jobs_stages"] = jobs_stages(tracker, g)
        out[f"{label}_sec"] = times
        out[f"{label}_sec_min"] = min(times)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
