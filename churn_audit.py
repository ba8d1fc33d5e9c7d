"""Long-churn state-size audit for the streaming ingest family.

The tombstone design claims (streaming/tombstones.py module docstring)
that maintenance bounds steady-state volume: updates/deletes append
O(|batch|) tombstones, raw state grows by churn between folds, and
`compact_state` physically drops dead rows then truncates the
fully-applied tombstones — so standing state returns to ~corpus size
after every fold no matter how long the stream runs. This script
MEASURES that claim instead of arguing it: a sustained-churn run through
RetrievalIngest + DedupIngest + AnnIngest with periodic maintenance,
recording raw (pre-resolve) state rows and tombstone rows per batch.

Usage:  python churn_audit.py [--batches 24] [--fold-every 6]
Prints one JSON line per observation plus a final markdown table for
NOTES.md. Corpus stays constant (every batch is update-churn over a
rotating 1/8 slice), so "bounded" means: raw rows right after each fold
are flat across folds, and tombstones truncate to 0.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_cdc_redshift_spark.streaming.ann_ingest import AnnIngest
from kafka_cdc_redshift_spark.streaming.dedup_ingest import DedupIngest
from kafka_cdc_redshift_spark.streaming.retrieval_ingest import RetrievalIngest
from kafka_cdc_redshift_spark.streaming.store import AppendLog
from kafka_cdc_redshift_spark.functions.similarity import subvector_codebooks


def _count(spark, log, table):
    df = log.read(spark, table)
    return 0 if df is None else df.count()


def observe(spark, log, ing_bm, ing_dd, ing_ann, label, batch):
    row = {
        "batch": batch,
        "at": label,
        "tf_rows": _count(spark, log, ing_bm.tf_table),
        "dl_rows": _count(spark, log, ing_bm.dl_table),
        "bm_tombs": _count(spark, log, ing_bm.dead_table),
        "bands_rows": _count(spark, log, ing_dd.bands_table),
        "sketch_rows": _count(spark, log, ing_dd.sketches_table),
        "dd_tombs": _count(spark, log, ing_dd.dead_table),
        "cells_rows": _count(spark, log, ing_ann.cells_table),
        "codes_rows": _count(spark, log, ing_ann.codes_table),
        "ann_tombs": _count(spark, log, ing_ann.dead_table),
    }
    print(json.dumps(row), flush=True)
    return row


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def cow_audit(spark, docs, args):
    """The copy-on-write half of the claim (r9 VERDICT item #6): run the
    same sustained-churn protocol through the TARGET store path
    (merge_changes + versioned publish), recording the per-fold
    version-chain length and on-disk store size. Two variants: the
    keep-everything opt-out (documents the O(batches) full-corpus chain
    — every publish is a complete copy under copy-on-write) and the
    `keep_versions` retention knob (store.prune_versions on the
    maintenance cycle), which must hold both chain length and bytes
    flat across folds."""
    from pyspark.sql import functions as F

    from kafka_cdc_redshift_spark.operators.merge import merge_changes
    from kafka_cdc_redshift_spark.operators.layout import compact_table
    from kafka_cdc_redshift_spark.streaming.store import ParquetTargetStore

    results = {}
    for label, keep in (("keep-all", None), ("keep=2", 2)):
        root = tempfile.mkdtemp(prefix=f"churn_cow_{label.replace('=','')}_")
        store = ParquetTargetStore(root)
        tdir = os.path.join(root, "docs")
        obs = []
        try:
            base = docs.select(
                "doc_id", "text", F.lit("c").alias("op"),
                F.lit(0).alias("ts_ms"),
            )
            store.publish(
                base.filter("op != 'd'").drop("op", "ts_ms"), "docs",
                batch_id=0,
            )
            for b in range(1, args.batches + 1):
                sl = b % args.slices
                upd = docs.filter(
                    F.col("doc_id") % args.slices == sl
                ).select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" churn{b}")).alias("text"),
                    F.lit("u").alias("op"),
                    F.lit(b).alias("ts_ms"),
                )
                target = store.read(spark, "docs")
                out = merge_changes(target, upd, ["doc_id"])
                store.publish(out, "docs", batch_id=b)
                if b % args.fold_every == 0:
                    compact_table(store, spark, "docs")
                    if keep is not None:
                        store.prune_versions("docs", keep=keep)
                    row = {
                        "variant": label, "batch": b, "at": "post-fold",
                        "version": store.current_version("docs"),
                        "chain_len": len(store.versions_on_disk("docs")),
                        "store_mb": round(_dir_bytes(tdir) / 1e6, 2),
                        "live_rows": store.read(spark, "docs").count(),
                    }
                    print(json.dumps(row), flush=True)
                    obs.append(row)
            results[label] = obs
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print("\n| variant | batch | version | chain len | store MB | live rows |")
    print("|---|---|---|---|---|---|")
    for rows in results.values():
        for r in rows:
            print(f"| {r['variant']} | {r['batch']} | {r['version']} "
                  f"| {r['chain_len']} | {r['store_mb']} "
                  f"| {r['live_rows']} |")
    pruned = results["keep=2"]
    bounded = all(
        r["chain_len"] <= 2
        and r["live_rows"] == pruned[0]["live_rows"]
        # flat within files-layout noise: churned text grows each doc by
        # one ~8-byte token per pass, so allow a few percent
        and r["store_mb"] <= pruned[0]["store_mb"] * 1.10
        for r in pruned
    )
    print(json.dumps({
        "metric": "churn_audit_cow",
        "folds": len(pruned),
        "keep_all_final_chain": results["keep-all"][-1]["chain_len"],
        "keep_all_final_mb": results["keep-all"][-1]["store_mb"],
        "keep2_final_chain": pruned[-1]["chain_len"],
        "keep2_final_mb": pruned[-1]["store_mb"],
        "live_rows": pruned[-1]["live_rows"],
        "bounded_with_keep_versions": bounded,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--fold-every", type=int, default=6)
    ap.add_argument("--slices", type=int, default=8,
                    help="churn 1/slices of the corpus per batch")
    ap.add_argument("--mode", choices=("ingest", "cow", "all"),
                    default="ingest")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("churn_audit")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_docs, n_vecs = docs.count(), emb.count()
    print(json.dumps({"corpus_docs": n_docs, "corpus_vecs": n_vecs,
                      "sf_dir": sf_dir, "mode": args.mode}), flush=True)

    if args.mode in ("cow", "all"):
        cow_audit(spark, docs, args)
        if args.mode == "cow":
            spark.stop()
            return

    state_dir = tempfile.mkdtemp(prefix="churn_audit_")
    log = AppendLog(state_dir)
    ing_bm = RetrievalIngest(log, name="docs", positions=True)
    ing_dd = DedupIngest(log, name="docs_dd")
    ing_ann = AnnIngest(
        log,
        centroids=emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("c_emb"),
        ),
        codebooks=subvector_codebooks(
            emb.filter(F.col("vec_id") < 32), n_sub=8
        ),
    )

    obs = []
    try:
        # batch 0: full-corpus bootstrap
        ing_bm.process_batch(docs, 0)
        ing_dd.process_batch(docs, 0)
        ing_ann.process_batch(emb, 0)
        obs.append(observe(spark, log, ing_bm, ing_dd, ing_ann,
                           "bootstrap", 0))

        for b in range(1, args.batches + 1):
            sl = b % args.slices
            upd = docs.filter(F.col("doc_id") % args.slices == sl).select(
                "doc_id",
                F.concat(F.col("text"),
                         F.lit(f" churn{b}")).alias("text"),
            )
            keys = upd.select("doc_id")
            ing_bm.process_batch(upd, b, tombstones=keys)
            ing_dd.process_batch(upd, b, tombstones=keys)
            vupd = emb.filter(F.col("vec_id") % args.slices == sl)
            ing_ann.process_batch(vupd, b,
                                  tombstones=vupd.select("vec_id"))
            obs.append(observe(spark, log, ing_bm, ing_dd, ing_ann,
                               "churn", b))
            if b % args.fold_every == 0:
                ing_bm.compact_state(spark, min_segments=2)
                ing_dd.compact_state(spark, min_segments=2)
                ing_ann.compact_state(spark, min_segments=2)
                obs.append(observe(spark, log, ing_bm, ing_dd, ing_ann,
                                   "post-fold", b))

        # markdown table for NOTES.md
        print("\n| batch | at | tf | dl | bands | sketch | cells | codes "
              "| tombs(bm/dd/ann) |")
        print("|---|---|---|---|---|---|---|---|---|")
        for r in obs:
            print(f"| {r['batch']} | {r['at']} | {r['tf_rows']} "
                  f"| {r['dl_rows']} | {r['bands_rows']} "
                  f"| {r['sketch_rows']} | {r['cells_rows']} "
                  f"| {r['codes_rows']} | {r['bm_tombs']}/{r['dd_tombs']}"
                  f"/{r['ann_tombs']} |")
        folds = [r for r in obs if r["at"] == "post-fold"]
        if folds:
            # per-doc tables (dl, sketches, cells, codes) must be EXACTLY
            # flat across folds at corpus size, and tombstones must
            # truncate to 0; tf_rows varies ±ε with the churned text's
            # token census (each update appends one marker token), so
            # it's reported but not the invariant.
            flat = all(
                r["dl_rows"] == folds[0]["dl_rows"]
                and r["sketch_rows"] == folds[0]["sketch_rows"]
                and r["cells_rows"] == folds[0]["cells_rows"]
                and r["codes_rows"] == folds[0]["codes_rows"]
                and r["bm_tombs"] == 0 and r["dd_tombs"] == 0
                and r["ann_tombs"] == 0
                for r in folds
            )
            print(json.dumps({
                "metric": "churn_audit",
                "folds": len(folds),
                "docs_per_fold": folds[0]["dl_rows"],
                "tf_first_fold": folds[0]["tf_rows"],
                "tf_last_fold": folds[-1]["tf_rows"],
                "bounded": flat,
            }), flush=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
