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
# registration order. This list pins the queries that MUST be checked this
# round (new, or changed signal/plan); the rest register stalest-driver-
# row-first (_stale_first) so rows refresh across the catalog over rounds.
_DRIVER_CHECK_FIRST = [
    # round 10 priority: another freshness-protection round by
    # arithmetic — the 48 queries whose newest green driver row is
    # r7-era hit the VERDICT's 2-round staleness limit at r10, and the
    # two r8-era rows whose plans changed in r9 (events_gapfill_locf
    # moved onto running_agg; cdc_qsketch_current's exact leg moved
    # onto range_partitioned_rank) must be re-hashed on their current
    # plans. 48 + 2 = exactly the ~50-row driver cap, so this round
    # budgets ZERO new catalog queries (r9 verdict item #1).
    # Everything after this list is ordered stalest-driver-row-first
    # (see _stale_first).
    # -- the 48 r7-era rows (2-round staleness limit at r10) --
    "cdc_ann_tombstones",
    "cdc_bm25_tombstones",
    "cdc_dedup_tombstones",
    "cdc_lww_dedup",
    "cdc_merge_into",
    "cdc_scd2_history",
    "corpus_ndv_incremental",
    "corpus_stats_approx_audit",
    "curation_pipeline_v2",
    "customers_lapsed",
    "dedup_containment",
    "dedup_keep_best",
    "dedup_keep_one",
    "dedup_minhash_eval",
    "dedup_semantic",
    "doc_chunk_dedup",
    "doc_pack_sequences",
    "doc_sample_stratified",
    "doc_source_mix",
    "doc_temperature_mix",
    "events_anomaly_zscore",
    "events_approx_distinct",
    "events_asof_enrich",
    "events_funnel",
    "events_hourly_rollup",
    "events_json_extract",
    "events_last_state",
    "events_range_join",
    "events_retention_cohort",
    "events_rollup_totals",
    "events_salted_agg",
    "events_salted_join",
    "events_sessionize",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "q10_returned_items",
    "q11_important_parts",
    "q14_promo_effect",
    "q18_large_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "sim_hybrid_rrf_ann",
    "source_lm_crossscore",
    "text_kneser_ney3",
    "text_lm_surprisal",
    "text_rrf_three_way",
    "text_tfidf_topk",
    # -- the 2 r9-plan-changed r8-era rows (re-pin per r9 verdict) --
    "events_gapfill_locf",  # plan changed r9: LOCF leg moved onto running_agg
    "cdc_qsketch_current",  # plan changed r9: exact leg on range_partitioned_rank
    # -- below the ~50 cut: the other rank-substrate consumers, whose
    # plans changed this round with the O(log P) bucket-stamp tree
    # (r9 verdict item #3). Exact bucket equivalence is pytest-pinned
    # (test_stamp_range_bucket_tree_is_exact_count_below + the standing
    # determinism/equivalence suite), so these ride on pytest until the
    # r11 re-pin if the driver stops at 50; listed here so any extra
    # cap checks them first --
    "doc_len_quantiles",
    "events_value_deciles",
    "doc_ccnet_buckets",
    "events_quantile_sketch_audit",
    "events_series_moving_avg",
]


def _stale_first() -> list[str]:
    """Order the non-priority tail by driver-row staleness: queries whose
    most recent CORRECTNESS row is oldest come first, so the driver's
    ~50-row cap rotates fresh rows across the whole catalog over rounds
    instead of re-checking the same prefix. Reads the CORRECTNESS_r*.json
    records committed in the repo root; falls back to catalog order."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last_round: dict[str, int] = {}
    try:
        for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
            rnd = int(path.rsplit("CORRECTNESS_r", 1)[1].split(".")[0])
            for name in json.load(open(path)):
                last_round[name] = max(last_round.get(name, 0), rnd)
    except Exception:  # noqa: BLE001 - ordering is an optimization only
        return list(SPECS)
    return sorted(SPECS, key=lambda n: (last_round.get(n, 0), n))


def _ordered_specs():
    first = [n for n in dict.fromkeys(_DRIVER_CHECK_FIRST) if n in SPECS]
    seen = set(first)
    rest = [n for n in _stale_first() if n not in seen]
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
