"""Parquet/file table sources for the batch engine and tests."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Catalyst pushes filters/projection into the scan —
    callers should select/filter on the returned frame, not pre-collect."""
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); ensure the session reads it
        # (runtime conf — also covers externally-created driver sessions)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long ns (spark.sql.legacy.parquet.nanosAsLong);
        # truncate to µs exactly like DuckDB/Arrow do and restore NTZ type.
        # integer `div`, not `/`: double division loses ulps at 1e18 ns
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df
