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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.spark) for name, spec in SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in SPECS.items() if spec.oracle is not None
    }
