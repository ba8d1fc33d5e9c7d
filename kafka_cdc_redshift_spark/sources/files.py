"""Parquet/file table sources for the batch engine and tests."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Catalyst pushes filters/projection into the scan —
    callers should select/filter on the returned frame, not pre-collect."""
    return spark.read.parquet(table_path(sf_dir, name))
