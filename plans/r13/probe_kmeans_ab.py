#!/usr/bin/env python
"""A/B probe (r13, change 7): does materializing the (id, double-cast
vector) training relation once for the whole Lloyd loop beat re-running
the embeddings scan + cast + spread repartition per action, once the
scan actually costs something?

At sf0.1 the embeddings table is 500 rows — per-query cost is job
overhead, not bytes, so the bench can't distinguish the shapes. This
probe replicates sf0.1 embeddings xN (default 2000 -> 1M vectors, an
sf20-equivalent training set) into /tmp parquet and times the full
kmeans(k=8, iters=2) count both ways, 3 timed runs each after a warm
run. No catalog query is touched; this is measurement evidence only.

Usage: python plans/r13/probe_kmeans_ab.py [replication (default 2000)]
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

from kafka_cdc_redshift_spark.functions import clustering  # noqa: E402
from kafka_cdc_redshift_spark.session import build_session  # noqa: E402


def kmeans_no_prep(emb, *, k=8, iters=2):
    """The pre-change shape: every action replays the scan lineage."""
    centroids = clustering._lloyd(
        emb, k=k, iters=iters, id_col="vec_id", vec_col="embedding"
    )
    final = clustering.assign_cells(
        emb, centroids, id_col="vec_id", vec_col="embedding"
    )
    sizes = final.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_size"))
    return final.select("vec_id", "cell").join(
        F.broadcast(sizes), "cell", "left"
    ).select("vec_id", "cell", "cell_size")


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = f"/tmp/kmeans_ab_emb_x{repl}.parquet"
    spark = build_session("probe_kmeans_ab")
    sc = spark.sparkContext
    if not os.path.exists(big):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        reps = spark.range(repl).select(F.col("id").alias("__rep"))
        (
            emb.crossJoin(reps)
            # distinct ids per replica so the k-seed stays unambiguous
            .withColumn(
                "vec_id",
                F.col("vec_id") + F.col("__rep") * F.lit(10_000_000),
            )
            .drop("__rep")
            .repartition(32)
            .write.mode("overwrite").parquet(big)
        )
    n = spark.read.parquet(big).count()
    out = {"rows": n, "replication": repl}
    for label, mk in (
        ("A_rescan_per_action",
         lambda: kmeans_no_prep(spark.read.parquet(big))),
        ("B_prepared_checkpoint",
         lambda: clustering.kmeans(spark.read.parquet(big), k=8, iters=2)),
    ):
        sc.setJobDescription(f"kmeans-ab:{label}:warm")
        mk().count()
        times = []
        for i in range(3):
            sc.setJobDescription(f"kmeans-ab:{label}:{i}")
            t0 = time.perf_counter()
            mk().count()
            times.append(round(time.perf_counter() - t0, 3))
        out[f"{label}_sec"] = times
        out[f"{label}_sec_min"] = min(times)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
