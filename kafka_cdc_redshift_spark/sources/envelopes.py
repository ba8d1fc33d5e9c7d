"""CDC envelope schemas + deterministic changelog synthesis.

Envelope shapes follow the reference's consumed formats (FIXTURES.md §A;
samples at reference README.md:316-527):

  Debezium/Flink-CDC : {before, after, source{db,table,ts_ms,...}, op, ts_ms}
  AWS DMS            : {data, metadata{timestamp, record-type, operation,
                        schema-name, table-name}}
  Canal              : {data: [...], database, table, type, ts}
  Mongo change stream: {fullDocument, operationType, documentKey, ns, ts_ms}

Unlike the reference — which re-infers the JSON schema per table per batch
(cdc_util/redshift_sink.py:592, a full extra pass over the data) — we build
an explicit StructType for a known payload schema, so `from_json` parses in
one codegen'd pass and Catalyst can prune unused envelope fields.

The synth_* helpers build deterministic changelogs from the driver's parquet
tables so the DuckDB oracle can replay the identical change log (FIXTURES.md
§D). Spec (keyed on o_orderkey):
  * insert 'c' for every row,            ts_ms = epoch_ms(o_orderdate)
  * update 'u' where key % 3 == 0,       ts_ms + 3_600_000, totalprice * 1.1
  * delete 'd' where key % 7 == 0,       ts_ms + 7_200_000
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .files import load_table

# ---------------------------------------------------------------------------
# Envelope StructTypes (parameterized by the row payload schema)
# ---------------------------------------------------------------------------


def debezium_schema(payload: T.StructType) -> T.StructType:
    """Debezium / Flink-CDC / MSK-Debezium envelope (README.md:316-392)."""
    return T.StructType(
        [
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("version", T.StringType(), True),
                        T.StructField("connector", T.StringType(), True),
                        T.StructField("name", T.StringType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField("snapshot", T.StringType(), True),
                        T.StructField("db", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def dms_schema(payload: T.StructType) -> T.StructType:
    """AWS DMS envelope (README.md:393-413)."""
    return T.StructType(
        [
            T.StructField("data", payload, True),
            T.StructField(
                "metadata",
                T.StructType(
                    [
                        T.StructField("timestamp", T.StringType(), True),
                        T.StructField("record-type", T.StringType(), True),
                        T.StructField("operation", T.StringType(), True),
                        T.StructField("schema-name", T.StringType(), True),
                        T.StructField("table-name", T.StringType(), True),
                        T.StructField("transaction-id", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def canal_schema(payload: T.StructType) -> T.StructType:
    """Canal envelope; `data` is an ARRAY of row images (redshift_sink.py:401-407)."""
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(payload), True),
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
        ]
    )


def mongo_schema() -> T.StructType:
    """Mongo change-stream envelope; fullDocument kept as raw JSON string
    (doc -> SUPER, mongo_redshift_sink.py:157-168)."""
    return T.StructType(
        [
            T.StructField("_id", T.StringType(), True),
            T.StructField("operationType", T.StringType(), True),
            T.StructField("fullDocument", T.StringType(), True),
            T.StructField("documentKey", T.StringType(), True),
            T.StructField(
                "ns",
                T.StructType(
                    [
                        T.StructField("db", T.StringType(), True),
                        T.StructField("coll", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# ---------------------------------------------------------------------------
# Deterministic changelog synthesis from the `orders` table
# ---------------------------------------------------------------------------

ORDERS_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)

# DuckDB twin of synth_orders_changelog(); oracle queries build on this CTE.
ORDERS_CHANGELOG_SQL = """
changelog AS (
    SELECT 'c' AS op, epoch_ms(o_orderdate) AS ts_ms,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders
    UNION ALL
    SELECT 'u', epoch_ms(o_orderdate) + 3600000,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 'd', epoch_ms(o_orderdate) + 7200000,
           o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 7 = 0
)
"""


def synth_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat (already parsed+flattened) changelog: op, ts_ms, <orders columns>.

    Delete rows carry the full row image — matching the engine's delete-image
    coalesce (reference rewrites after:=before for op='d',
    cdc_util/redshift_sink.py:54-67).
    """
    orders = load_table(spark, sf_dir, "orders")
    # parquet timestamps load as TIMESTAMP_NTZ in Spark 4; session TZ is UTC so
    # the LTZ cast is a no-op instant-wise and matches DuckDB's epoch_ms().
    base_ts = F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz"))
    inserts = orders.select(
        F.lit("c").alias("op"), base_ts.alias("ts_ms"), *ORDERS_COLS
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
        .select(F.lit("u").alias("op"), (base_ts + 3_600_000).alias("ts_ms"), *ORDERS_COLS)
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(F.lit("d").alias("op"), (base_ts + 7_200_000).alias("ts_ms"), *ORDERS_COLS)
    )
    return inserts.unionByName(updates).unionByName(deletes)


def synth_debezium_topic(
    spark: SparkSession, sf_dir: str, ops: tuple[str, ...] | None = None,
    include_customer: bool = True,
) -> DataFrame:
    """Multiplexed Kafka-topic lookalike: DataFrame[value: string] carrying
    full Debezium envelopes for TWO tables (salesdb.orders + salesdb.customer)
    so routing has something to discriminate (reference routes by
    '"db":"X"' + '"table":"Y"' regex, cdc_util/redshift_sink.py:36-48).
    `ops` restricts the orders changelog (e.g. ('c',) for an insert-only
    batch in streaming tests)."""
    cl = synth_orders_changelog(spark, sf_dir)
    if ops is not None:
        cl = cl.filter(F.col("op").isin(*ops))
    row = F.struct(*[F.col(c) for c in ORDERS_COLS])
    orders_env = cl.select(
        F.to_json(
            F.struct(
                F.when(F.col("op") == "d", row).otherwise(F.lit(None)).alias("before"),
                F.when(F.col("op") != "d", row).otherwise(F.lit(None)).alias("after"),
                F.struct(
                    F.lit("salesdb").alias("db"),
                    F.lit("orders").alias("table"),
                    F.col("ts_ms").alias("ts_ms"),
                ).alias("source"),
                F.col("op"),
                F.col("ts_ms"),
            )
        ).alias("value")
    )
    if not include_customer:
        return orders_env
    cust = load_table(spark, sf_dir, "customer")
    cust_row = F.struct("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    cust_env = cust.select(
        F.to_json(
            F.struct(
                F.lit(None).cast("string").alias("before"),
                cust_row.alias("after"),
                F.struct(
                    F.lit("salesdb").alias("db"),
                    F.lit("customer").alias("table"),
                    F.lit(0).cast("long").alias("ts_ms"),
                ).alias("source"),
                F.lit("r").alias("op"),
                F.lit(0).cast("long").alias("ts_ms"),
            )
        ).alias("value")
    )
    return orders_env.unionByName(cust_env)


def synth_dms_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AWS-DMS-style envelopes (README.md:393-413) for salesdb.orders:
    `data` carries the row image, `metadata.timestamp` an ISO second-precision
    string, `metadata.operation` in {load,insert,update,delete}. Includes
    control records (metadata.record-type='control') that routing must drop
    (redshift_sink.py:24-29)."""
    cl = synth_orders_changelog(spark, sf_dir)
    op_name = (
        F.when(F.col("op") == "c", "insert")
        .when(F.col("op") == "u", "update")
        .when(F.col("op") == "d", "delete")
    )
    # second-precision ISO string; the synth changelog's ts_ms are whole
    # seconds (epoch_ms(date) + hour offsets) so no precision is lost
    iso_ts = F.date_format(
        F.timestamp_seconds(F.col("ts_ms") / 1000), "yyyy-MM-dd HH:mm:ss"
    )
    data_rows = cl.select(
        F.to_json(
            F.struct(
                F.struct(*[F.col(c) for c in ORDERS_COLS]).alias("data"),
                F.struct(
                    iso_ts.alias("timestamp"),
                    F.lit("data").alias("record-type"),
                    op_name.alias("operation"),
                    F.lit("salesdb").alias("schema-name"),
                    F.lit("orders").alias("table-name"),
                ).alias("metadata"),
            )
        ).alias("value")
    )
    control = spark.range(8).select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit("control").alias("record-type"),
                    F.lit("salesdb").alias("schema-name"),
                    F.lit("orders").alias("table-name"),
                ).alias("metadata"),
            )
        ).alias("value")
    )
    return data_rows.unionByName(control)


MONGO_TS_BASE = 1_700_000_000_000


def synth_mongo_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo change-stream envelopes (README.md:414-527) over `customer`:
    insert for every row, replace (acctbal+100) for custkey%3==0, delete for
    custkey%7==0; documentKey is the scalar-_id form; ts_ms deterministic
    from the key so the DuckDB oracle can replay it."""
    cust = load_table(spark, sf_dir, "customer")
    ts0 = (F.lit(MONGO_TS_BASE) + F.col("c_custkey") * 1000).cast("long")
    doc = F.to_json(F.struct("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
    doc2 = F.to_json(
        F.struct(
            F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey"),
            (F.col("c_acctbal") + 100).alias("c_acctbal"),
        )
    )
    dockey = F.concat(F.lit('{"_id": '), F.col("c_custkey"), F.lit("}"))

    def env(op, doc_col, ts):
        return F.to_json(
            F.struct(
                F.lit(op).alias("operationType"),
                doc_col.alias("fullDocument"),
                dockey.alias("documentKey"),
                F.struct(
                    F.lit("appdb").alias("db"), F.lit("customer").alias("coll")
                ).alias("ns"),
                ts.alias("ts_ms"),
            )
        ).alias("value")

    inserts = cust.select(env("insert", doc, ts0))
    replaces = cust.filter(F.col("c_custkey") % 3 == 0).select(
        env("replace", doc2, ts0 + 3_600_000)
    )
    deletes = cust.filter(F.col("c_custkey") % 7 == 0).select(
        env("delete", F.lit(None).cast("string"), ts0 + 7_200_000)
    )
    return inserts.unionByName(replaces).unionByName(deletes)


def synth_canal_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal-style envelopes: each message's `data` array holds TWO images of
    the same row (second one with o_totalprice*2) at the same ts, so the
    positional tiebreak (max array index wins, redshift_sink.py:206-209)
    is what decides the winner."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = F.struct(*[F.col(c) for c in ORDERS_COLS])
    v2 = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.col("o_orderdate"), F.col("o_orderpriority"),
    )
    return orders.select(
        F.array(v1, v2).alias("data"),
        F.lit("salesdb").alias("database"),
        F.lit("orders").alias("table"),
        F.lit("UPDATE").alias("type"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz")).alias("ts"),
    )


def synth_debezium_before_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium topic whose UPDATE envelopes carry their true BEFORE
    image — what a real connector emits and what current-state
    incremental maintenance (functions/incremental.group_stats_cdc)
    consumes: an update is (-before, +after), a delete is (-before).
    Consistency matters: a key updated then deleted (o_orderkey % 21
    == 0) must be deleted with the UPDATED image as its before — the
    state being removed — not the original insert."""
    orders = load_table(spark, sf_dir, "orders")
    base_ts = F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz"))
    orig = F.struct(*[F.col(c) for c in ORDERS_COLS])
    upd = F.struct(*[
        (F.col(c) * F.lit(1.1)).alias(c) if c == "o_totalprice" else F.col(c)
        for c in ORDERS_COLS
    ])
    live = F.when(F.col("o_orderkey") % 3 == 0, upd).otherwise(orig)

    def env(before, after, op, ts):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.struct(
                    F.lit("salesdb").alias("db"),
                    F.lit("orders").alias("table"),
                    ts.alias("ts_ms"),
                ).alias("source"),
                op.alias("op"),
                ts.alias("ts_ms"),
            )
        ).alias("value")

    null_row = F.lit(None).cast(
        "struct<" + ",".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in orders.select(*ORDERS_COLS).schema.fields
        ) + ">"
    )
    inserts = orders.select(env(null_row, orig, F.lit("c"), base_ts))
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        env(orig, upd, F.lit("u"), base_ts + 3_600_000)
    )
    deletes = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        env(live, null_row, F.lit("d"), base_ts + 7_200_000)
    )
    return inserts.unionByName(updates).unionByName(deletes)
