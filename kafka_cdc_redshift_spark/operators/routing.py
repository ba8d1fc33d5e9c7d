"""Table routing over a multiplexed CDC topic — native predicates.

The reference routes with a Python regex UDF over the raw JSON string
(cdc_util/redshift_sink.py:18-51, applied :585). That is a row-at-a-time
Python round-trip per table per batch AND an optimizer black box: Catalyst
cannot push it down or prune behind it.

Here routing is a native column predicate on `get_json_object` — JVM-side,
codegen'd, pushdown-friendly. At 100 TB with N tables fanning out over one
cached batch, this removes N full Python passes per micro-batch.

Regex table rules (the reference allows `table` to be a regex, README.md:42)
use `rlike` with an anchored pattern — still JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _match(col: Column, value: str, is_regex: bool) -> Column:
    return col.rlike(f"^(?:{value})$") if is_regex else (col == F.lit(value))


def route_debezium(df: DataFrame, db: str, table: str, *, value_col: str = "value",
                   table_is_regex: bool = False) -> DataFrame:
    """Keep rows of one source table from a Debezium/Flink-CDC topic.
    Replaces the '"db":"X"'+'"table":"Y"' regex UDF (redshift_sink.py:36-41)."""
    v = F.col(value_col)
    return df.filter(
        (F.get_json_object(v, "$.source.db") == db)
        & _match(F.get_json_object(v, "$.source.table"), table, table_is_regex)
    )


def route_dms(df: DataFrame, schema_name: str, table: str, *, value_col: str = "value",
              table_is_regex: bool = False) -> DataFrame:
    """DMS routing; control records are dropped (record-type 'control'),
    matching redshift_sink.py:24-29."""
    v = F.col(value_col)
    return df.filter(
        (F.get_json_object(v, "$.metadata.schema-name") == schema_name)
        & _match(F.get_json_object(v, "$.metadata.table-name"), table, table_is_regex)
        & (F.get_json_object(v, "$.metadata.record-type") != "control")
    )


def route_canal(df: DataFrame, database: str, table: str, *, value_col: str = "value",
                table_is_regex: bool = False) -> DataFrame:
    """Canal routing by top-level database/table (redshift_sink.py:43-48)."""
    v = F.col(value_col)
    return df.filter(
        (F.get_json_object(v, "$.database") == database)
        & _match(F.get_json_object(v, "$.table"), table, table_is_regex)
    )


def route_mongo(df: DataFrame, db: str, coll: str, *, value_col: str = "value") -> DataFrame:
    """Mongo change-stream routing by ns.db/ns.coll (mongo_redshift_sink.py:16-30)."""
    v = F.col(value_col)
    return df.filter(
        (F.get_json_object(v, "$.ns.db") == db)
        & (F.get_json_object(v, "$.ns.coll") == coll)
    )
