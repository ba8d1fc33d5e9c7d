"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (full Debezium CDC pipeline) at sf0.001
queries()      -> name -> (spark, sf_dir) -> DataFrame, per SURVEY.md §2
oracle_sql()   -> name -> equivalent DuckDB SQL over the same parquet views

Implementation lives in kafka_cdc_redshift_spark/plans/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_redshift_spark.plans import SPECS  # noqa: E402


def _conf(spark: SparkSession) -> None:
    # the driver may pass a session without our conf; epoch<->timestamp
    # conversions (and hence oracle parity) assume a UTC session TZ, and
    # events.parquet carries TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multiplexed Debezium JSON topic -> route -> parse -> LWW
    dedup -> merge into the keyed target (SURVEY §2 minimum slice)."""
    _conf(spark)
    return SPECS["cdc_pipeline_debezium"].spark(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _conf(spark)
        return fn(spark, sf_dir)

    return run


# The driver's correctness check records at most ~50 queries per round, in
# registration order. Queries with no green driver row yet (new this round,
# or never reached in a prior round) are listed here so they register FIRST;
# everything else follows in catalog order (all of those have green rows in
# CORRECTNESS_r01/r02 already).
_DRIVER_CHECK_FIRST = [
    # round 4: every query holds a driver row across r01-r03; the two
    # whose signal changed this round go first — corpus_group_stats was
    # the r3 red row (oracle type fixed: CAST(sum AS BIGINT)) and
    # events_approx_distinct had no oracle until now (deterministic
    # exact-count + in-query error-bound flag)
    "corpus_group_stats",
    "events_approx_distinct",
    # new in round 4 — no driver rows yet
    "dedup_lsh_incremental",
    "corpus_stats_approx_audit",
    # queries whose Spark plan changed in round 4 (per-stratum pre-prune /
    # localCheckpoint) — re-confirm their rows stay green
    "doc_source_mix",
    "doc_sample_k_per_source",
    "q11_important_parts",
    "cdc_scd2_history",
    # r3-first-checked set retained (their r3 rows are green; keeping the
    # order stable costs nothing under the ~50 cap)
    "dedup_keep_one",
    "emb_kmeans",
    "emb_normalize",
    "emb_quantize",
    "multimodal_feature_extract",
    "text_commonness",
    "text_gopher_filters",
    "text_ngram_counts",
    "text_pii_redact",
    "text_repetition",
    "text_tfidf_topk",
    # new in round 3 (plans/catalog_ext.py) — no driver rows yet
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "events_moving_avg",
    "events_pivot_counts",
    "orders_cube",
    "customers_lapsed",
    "doc_len_quantiles",
    "doc_chunks",
    "sim_pair_hist",
    "events_sliding_rollup",
    "dedup_minhash_eval",
    # late round 3 (remaining TPC-H shapes + LLM-pipeline ops)
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_shipping",
    "q20_excess_suppliers",
    "q21_sole_late_supplier",
    "dedup_semantic",
    "doc_source_mix",
    "doc_chunk_dedup",
    "doc_contamination",
    "events_gapfill_locf",
    "cdc_scd2_history",
    "curation_pipeline_v2",
    "profile_documents",
    "events_value_deciles",
    "events_value_percentiles",
    "events_winsorize_bounds",
    "doc_sample_k_per_source",
    "events_value_hour_corr",
]


def _ordered_specs():
    first = [n for n in dict.fromkeys(_DRIVER_CHECK_FIRST) if n in SPECS]
    rest = [n for n in SPECS if n not in set(first)]
    for n in first + rest:
        yield n, SPECS[n]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.spark) for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_specs()
        if spec.oracle is not None
    }
