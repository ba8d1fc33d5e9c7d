"""Keyed target-table store over parquet with atomic versioned swaps.

Replaces the reference's Redshift staging-table + transactional merge
(cdc_util/redshift_sink.py:477-509): the merge itself is the in-engine
left-anti join + union (operators/merge.py); this store provides the
transactional *publish* — each merge writes a new `version=N` directory and
flips a pointer file, so readers never observe a partial write and a failed
batch leaves the previous version intact (same effect as the reference's
BEGIN...END).

At scale the store maps onto any table format with atomic commit (Delta/
Iceberg swap, or HDFS rename); version dirs keep history for replay audits.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class ParquetTargetStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_current.json")

    def current_version(self, table: str) -> int | None:
        try:
            with open(self._meta_path(table)) as f:
                return json.load(f)["version"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def path(self, table: str) -> str | None:
        v = self.current_version(table)
        if v is None:
            return None
        return os.path.join(self.root, table, f"version={v}")

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        p = self.path(table)
        return spark.read.parquet(p) if p else None

    def publish(self, df: DataFrame, table: str) -> int:
        """Write df as the next version and atomically flip the pointer."""
        prev = self.current_version(table)
        nxt = 0 if prev is None else prev + 1
        out = os.path.join(self.root, table, f"version={nxt}")
        df.write.mode("overwrite").parquet(out)
        tmp = self._meta_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": nxt}, f)
        os.replace(tmp, self._meta_path(table))  # atomic pointer flip
        return nxt
