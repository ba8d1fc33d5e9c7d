#!/usr/bin/env python
"""A/B probe (r13, change 8): in the bloom-vs-exact contamination audit,
does building the corpus (doc_id, gh) shingle explode ONCE
(localCheckpoint) and threading it through both probes beat re-running
the tokenize+shingle+md5 pass per probe?

At sf0.1 the bench can't separate the shapes (1.62 s either way, mostly
per-query floor). This probe replicates sf0.1 documents xN (default 50
-> 250k docs) and times the full audit both ways (noop sink, warm run +
3 timed runs each). Contrast with probe_kmeans_ab.py, where the
checkpoint LOST: here the shared lineage is a heavy per-row computation
(explode to ~n_tokens rows/doc, md5 per shingle), not a mere scan.

Usage: python plans/r13/probe_contam_ab.py [replication (default 50)]
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

from kafka_cdc_redshift_spark.functions import curation, membership  # noqa: E402
from kafka_cdc_redshift_spark.session import build_session  # noqa: E402


def audit_shared(docs, eval_df):
    """The r13 shape: one checkpointed explode per side, both probes read it."""
    tr = curation.doc_shingle_hashes(docs).localCheckpoint(eager=False)
    evh = curation.eval_shingle_hashes(eval_df).localCheckpoint(eager=False)
    bloom = membership.bloom_from_hashes(evh, "gh")
    pre = membership.contamination_prefilter_from_hashes(tr, bloom)
    exact = curation.contamination_score_from_hashes(tr, evh).select(
        "doc_id", "n_matched"
    )
    return pre.join(exact, "doc_id").select(
        "doc_id", "n_shingles", "bloom_matched", "n_matched",
        (F.col("bloom_matched") >= F.col("n_matched")).alias("bloom_ge_exact"),
    )


def audit_replay(docs, eval_df):
    """The r12 shape: each probe replays its own shingle explode."""
    bloom = membership.ngram_bloom(eval_df)
    pre = membership.contamination_prefilter(docs, bloom)
    exact = curation.contamination_score(docs, eval_df).select(
        "doc_id", "n_matched"
    )
    return pre.join(exact, "doc_id").select(
        "doc_id", "n_shingles", "bloom_matched", "n_matched",
        (F.col("bloom_matched") >= F.col("n_matched")).alias("bloom_ge_exact"),
    )


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = f"/tmp/contam_ab_docs_x{repl}.parquet"
    spark = build_session("probe_contam_ab")
    sc = spark.sparkContext
    if not os.path.exists(big):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        reps = spark.range(repl).select(F.col("id").alias("__rep"))
        (
            docs.crossJoin(reps)
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("__rep") * F.lit(10_000_000),
            )
            .drop("__rep")
            .repartition(32)
            .write.mode("overwrite").parquet(big)
        )
    n = spark.read.parquet(big).count()
    out = {"rows": n, "replication": repl}
    for label, fn in (
        ("A_replay_per_probe", audit_replay),
        ("B_shared_checkpoint", audit_shared),
    ):
        def mk():
            d = spark.read.parquet(big)
            return fn(d, d.filter(F.col("doc_id") % 97 == 0))
        sc.setJobDescription(f"contam-ab:{label}:warm")
        mk().write.format("noop").mode("overwrite").save()
        times = []
        for i in range(3):
            sc.setJobDescription(f"contam-ab:{label}:{i}")
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[f"{label}_sec"] = times
        out[f"{label}_sec_min"] = min(times)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
