"""JDBC merge sink: staged upsert into an external keyed table.

Parity with the reference's Redshift write path (cdc_util/redshift_sink.py:
244-253, 477-527): stage the batch, then one transaction of
  DELETE FROM target USING stage ON <pk>   (J2)
  INSERT INTO target SELECT ... FROM (re-deduped stage) WHERE op != delete (J3/W6)
  TRUNCATE stage                            (D8)
with target bootstrap CTAS (D7) and a drop-staging-and-retry-once wrapper
(error path :528-547).

The SQL generation is pure and unit-tested; execution needs a JDBC driver
jar + live database, so `JdbcMergeSink.apply_batch` stages via
`df.write.jdbc` and runs post-actions through the JVM DriverManager — both
skipped gracefully (raising JdbcUnavailable) when no driver is present, as
in this test environment.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame


class JdbcUnavailable(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# Bulk staged load (S3 + COPY via the spark-redshift community connector)
#
# The reference never row-inserts a batch: it stages through S3 and lets the
# warehouse COPY it, with bad-record tolerance and column truncation
# (cdc_util/redshift_sink.py:345-359, 514-527; README.md:61-71). At the
# reference's 1M rows/trigger that is the difference between a 30 s batch
# and a multi-minute one. These helpers generate the exact writer options;
# execution needs the connector jar + live warehouse, so generation is pure
# and unit-tested while `write_bulk_staged` gates on the environment.
# ---------------------------------------------------------------------------

BULK_CONNECTOR_FORMAT = "io.github.spark_redshift_community.spark.redshift"


@dataclass(frozen=True)
class BulkLoadOptions:
    """COPY-path tuning (reference defaults: tempformat CSV, maxerror from
    config `maxerror`, TRUNCATECOLUMNS always on, auto date/time formats)."""

    tempdir: str                      # S3 staging prefix (redshift_tmpdir)
    tempformat: str = "CSV"           # CSV | CSV GZIP | JSON (README.md:66)
    maxerror: int = 0                 # tolerated bad records per COPY
    truncate_columns: bool = True     # TRUNCATECOLUMNS: clip oversize varchars
    region: str | None = None
    s3_endpoint: str | None = None
    iam_role: str | None = None

    def extracopyoptions(self) -> str:
        parts = []
        if self.truncate_columns:
            parts.append("TRUNCATECOLUMNS")
        if self.region:
            parts.append(f"region '{self.region}'")
        parts.append(f"maxerror {self.maxerror}")
        parts.append("dateformat 'auto' timeformat 'auto'")
        return " ".join(parts)


def bulk_writer_options(
    *,
    url: str,
    stage_table: str,
    user: str,
    password: str,
    post_actions: Sequence[str],
    bulk: BulkLoadOptions,
) -> dict[str, str]:
    """Writer options for one staged batch: stage lands via COPY, then the
    merge transaction runs as `postactions` — atomic on the warehouse side,
    one network round-trip (redshift_sink.py:345-359)."""
    opts = {
        "url": url,
        "dbtable": stage_table,
        "user": user,
        "password": password,
        "tempdir": bulk.tempdir,
        "tempformat": bulk.tempformat,
        "postactions": "; ".join(post_actions),
        "extracopyoptions": bulk.extracopyoptions(),
    }
    if bulk.region:
        opts["tempdir_region"] = bulk.region
    if bulk.s3_endpoint:
        opts["s3_endpoint"] = bulk.s3_endpoint
    if bulk.iam_role:
        opts["aws_iam_role"] = bulk.iam_role
    return opts


def write_bulk_staged(
    df: DataFrame,
    *,
    url: str,
    db: str,
    table: str,
    keys: Sequence[str],
    user: str,
    password: str,
    bulk: BulkLoadOptions,
    skip_delete: bool = False,
) -> None:
    """Stage `df` through S3+COPY and merge via postactions. Raises
    JdbcUnavailable when the connector jar isn't on the classpath (as in
    this test environment)."""
    stage = stage_table_name(db, table)
    stmts = build_merge_sql(
        target=table, stage=stage, columns=df.columns, keys=keys,
        skip_delete=skip_delete,
    )
    opts = bulk_writer_options(
        url=url, stage_table=stage, user=user, password=password,
        post_actions=stmts, bulk=bulk,
    )
    writer = df.write.format(BULK_CONNECTOR_FORMAT)
    for k, v in opts.items():
        writer = writer.option(k, v)
    try:
        writer.mode("append").save()
    except Exception as e:  # noqa: BLE001
        raise JdbcUnavailable(f"bulk connector unavailable: {e}") from e


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'  # quoted identifiers (P6)


def stage_table_name(db: str, table: str) -> str:
    return f"stage_table_{db}_{table}"  # redshift_sink.py:385-389


def merge_condition(stage: str, target: str, keys: Sequence[str]) -> str:
    """Multi-column equi-join predicate (J1, redshift_sink.py:229-236)."""
    return " AND ".join(
        f"{stage}.{_q(k)} = {target}.{_q(k)}" for k in keys
    )


def build_merge_sql(
    *,
    target: str,
    stage: str,
    columns: Sequence[str],
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "d",
    skip_delete: bool = False,
    bootstrap: bool = True,
) -> list[str]:
    """Transactional post-actions for one staged batch."""
    cols_no_op = [c for c in columns if c != op_col]  # op never lands (P5)
    collist = ", ".join(_q(c) for c in cols_no_op)
    on = merge_condition(stage, target, keys)
    pklist = ", ".join(_q(k) for k in keys)
    stmts: list[str] = []
    if bootstrap:
        # empty CTAS bootstrap (D7, redshift_sink.py:498-501)
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {target} AS "
            f"SELECT {collist} FROM {stage} WHERE 1 = 3"
        )
    stmts.append("BEGIN")
    stmts.append(f"DELETE FROM {target} USING {stage} WHERE {on}")
    delete_filter = "" if skip_delete else f" WHERE {_q(op_col)} != '{delete_op}'"
    # staging re-dedup guard (W6, redshift_sink.py:474-476, 494-496)
    stmts.append(
        f"INSERT INTO {target} ({collist}) "
        f"SELECT {collist} FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {pklist} ORDER BY {pklist}) AS seqnum_aws "
        f"FROM {stage}{delete_filter}) s WHERE seqnum_aws = 1"
    )
    stmts.append(f"TRUNCATE TABLE {stage}")
    stmts.append("END")
    return stmts


class JdbcMergeSink:
    def __init__(self, url: str, *, user: str, password: str,
                 driver: str = "org.postgresql.Driver",
                 batchsize: int = 10_000,
                 bulk: BulkLoadOptions | None = None):
        self.url = url
        self.user = user
        self.password = password
        self.driver = driver
        # rows per JDBC executeBatch on the generic staging path; the
        # COPY-path analog of the reference's bulk options. Postgres-family
        # targets also want reWriteBatchedInserts=true on the url.
        self.batchsize = batchsize
        # when set, apply_batch stages through S3+COPY (write_bulk_staged)
        # instead of row-batched JDBC inserts
        self.bulk = bulk

    def _props(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "batchsize": str(self.batchsize),
        }

    def _connection(self, spark):
        try:
            jvm = spark.sparkContext._jvm
            jvm.java.lang.Class.forName(self.driver)
            return jvm.java.sql.DriverManager.getConnection(
                self.url, self.user, self.password
            )
        except Exception as e:  # noqa: BLE001
            raise JdbcUnavailable(f"JDBC driver/connection unavailable: {e}") from e

    def run_sql(self, spark, statements: Sequence[str]) -> None:
        conn = self._connection(spark)
        try:
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
        finally:
            conn.close()

    def apply_batch(
        self,
        df: DataFrame,
        *,
        db: str,
        table: str,
        keys: Sequence[str],
        skip_delete: bool = False,
        retry: bool = True,
    ) -> None:
        """Stage the batch and merge. Retries once after dropping a possibly
        half-written staging table (redshift_sink.py:528-547)."""
        if self.bulk is not None:
            write_bulk_staged(
                df, url=self.url, db=db, table=table, keys=keys,
                user=self.user, password=self.password, bulk=self.bulk,
                skip_delete=skip_delete,
            )
            return
        spark = df.sparkSession
        stage = stage_table_name(db, table)
        stmts = build_merge_sql(
            target=table, stage=stage, columns=df.columns, keys=keys,
            skip_delete=skip_delete,
        )
        props = self._props()
        try:
            df.write.jdbc(self.url, stage, mode="append", properties=props)
            self.run_sql(spark, stmts)
        except JdbcUnavailable:
            raise
        except Exception:
            if not retry:
                raise
            self.run_sql(spark, [f"DROP TABLE IF EXISTS {stage}"])
            df.write.jdbc(self.url, stage, mode="append", properties=props)
            self.run_sql(spark, stmts)

    def append_table(self, df: DataFrame, table: str) -> None:
        """Plain batched append (the <table>_delete stream,
        redshift_sink.py:242-253)."""
        df.write.jdbc(self.url, table, mode="append", properties=self._props())

    def fetch_catalog_rows(
        self, spark, table: str, schema: str = "public"
    ) -> list[tuple[str, str]]:
        """Live-catalog probe for ignore_ddl mode: (column, type string)
        rows from pg_table_def (redshift_schema_evolution.py:98-100); feed
        to operators.schema_evolution.catalog_to_struct -> cast_to_target."""
        from ..operators.schema_evolution import catalog_query

        conn = self._connection(spark)
        try:
            rs = conn.createStatement().executeQuery(catalog_query(table, schema))
            rows = []
            while rs.next():
                rows.append((rs.getString(1), rs.getString(2)))
            return rows
        finally:
            conn.close()
