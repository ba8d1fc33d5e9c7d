#!/usr/bin/env python
"""Scale-exponent probe (r11 verdict item 5): back the "survives 100x"
plan grades with a measurement — run the heaviest catalog queries at
sf0.1 and at a 10x corpus (sf1) and record wall-time ratios.

sf1 synthesis (documents + embeddings only — the five probe queries
touch nothing else): 10 copies of the sf0.1 tables with the
DISTRIBUTION preserved per copy and NO cross-copy duplicate structure,
so the workload is "the same data, 10x more of it", not a different
workload:

  * documents: copy i>0 suffixes EVERY token with "~i" — intra-copy
    shingle/token relations (near-dup cliques, n-gram stats, length
    distributions) are preserved exactly, while cross-copy shingle
    jaccard is 0 (no near-dup clique inflation, which would grow the
    pair count quadratically and change the workload shape).
  * embeddings: copy i>0 applies a copy-specific per-dimension SIGN
    pattern. One sign vector s applied to all vectors of a copy keeps
    every intra-copy dot product exactly ((s.x).(s.y) = x.y) — the
    copy's ANN geometry is bit-preserved — while cross-copy vectors
    decorrelate.

Keys shift by copy * (max_id + 1). Deterministic, no RNG. Output dir:
/root/repo/testdata_sf1 (generated once, reused).

Prints ONE JSON line:
  {"metric": "scale_exponent_probe", "queries": {name:
      {"sf0.1_sec": a, "sf1_sec": b, "ratio": b/a,
       "exponent": log(b/a) / log(10)}}, ...}
(wall = c * N^e under a 10x data step => e = log10(ratio): ratio 10 is
exponent 1.0 = linear, ratio 100 would be 2.0 = quadratic.)

An exponent near 1.0 = linear scaling; clearly above ~1.3 earns a plan
note and a spot on the next round's work list.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata_sf1")
COPIES = 10
PROBE_QUERIES = (
    "sim_hybrid_rrf_ann",
    "sim_rrf_three_way_served",
    "text_rrf_three_way",
    "dedup_minhash_eval",
    "doc_ccnet_buckets",
)


def _sign(dim: int, copy: int) -> int:
    # deterministic per-(dimension, copy) sign; copy 0 is identity
    if copy == 0:
        return 1
    h = (dim * 1103515245 + copy * 12345 + 1013904223) & 0xFFFFFFFF
    return 1 - 2 * ((h >> 7) & 1)


def generate_sf1() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)

    # -- documents ---------------------------------------------------------
    out_doc = os.path.join(SF1, "documents.parquet")
    if not os.path.exists(out_doc):
        t = pq.read_table(os.path.join(SF01, "documents.parquet"))
        doc_id = t.column("doc_id").to_pylist()
        text = t.column("text").to_pylist()
        lang = t.column("lang").to_pylist()
        source = t.column("source").to_pylist()
        shift = max(doc_id) + 1
        ids, texts, langs, sources, n_chars = [], [], [], [], []
        for c in range(COPIES):
            tag = f"~{c}"
            for j in range(len(doc_id)):
                ids.append(doc_id[j] + c * shift)
                if c == 0:
                    s = text[j]
                else:
                    # suffix every token: intra-copy relations exact,
                    # cross-copy shingle overlap zero
                    s = " ".join(w + tag for w in text[j].split())
                texts.append(s)
                langs.append(lang[j])
                sources.append(source[j])
                n_chars.append(len(s))
        pq.write_table(
            pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }),
            out_doc,
        )

    # -- embeddings --------------------------------------------------------
    out_emb = os.path.join(SF1, "embeddings.parquet")
    if not os.path.exists(out_emb):
        t = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
        vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
        label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
        shift = int(vec_id.max()) + 1
        dims = emb.shape[1]
        ids_all, emb_all, lab_all = [], [], []
        for c in range(COPIES):
            signs = np.asarray(
                [_sign(d, c) for d in range(dims)], dtype=np.float32
            )
            ids_all.append(vec_id + c * shift)
            emb_all.append(emb * signs)  # norms + intra-copy dots exact
            lab_all.append(label)
        ids_np = np.concatenate(ids_all)
        emb_np = np.concatenate(emb_all)
        lab_np = np.concatenate(lab_all)
        pq.write_table(
            pa.table({
                "vec_id": pa.array(ids_np, pa.int64()),
                "embedding": pa.array(
                    [row for row in emb_np.tolist()],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(lab_np, pa.int32()),
            }),
            out_emb,
        )


def main() -> None:
    generate_sf1()

    from kafka_cdc_redshift_spark.plans import SPECS
    from kafka_cdc_redshift_spark.session import build_session

    spark = build_session("scale_probe")
    spark.range(256).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()  # fork the Python/Arrow worker pool once

    runs = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2")))
    record: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        spec = SPECS[name]
        row: dict[str, float] = {}
        for sf_key, sf_dir, n_copies in (("sf0.1", SF01, 1), ("sf1", SF1, COPIES)):
            spec.spark(spark, sf_dir).count()  # warm (fixture build, codegen)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                spec.spark(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            row[f"{sf_key}_sec"] = round(min(samples), 3)
        ratio = row["sf1_sec"] / max(row["sf0.1_sec"], 1e-9)
        row["ratio"] = round(ratio, 2)
        # wall = c * N^e  ->  e = log(ratio) / log(10)
        row["exponent"] = round(math.log(max(ratio, 1e-9)) / math.log(COPIES), 2)
        record[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    print(json.dumps({
        "metric": "scale_exponent_probe",
        "copies": COPIES,
        "runs_per_point": runs,
        "queries": record,
    }))


if __name__ == "__main__":
    main()
