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

from pyspark.sql import DataFrame


class JdbcUnavailable(RuntimeError):
    pass


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
                 driver: str = "org.postgresql.Driver"):
        self.url = url
        self.user = user
        self.password = password
        self.driver = driver

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
        spark = df.sparkSession
        stage = stage_table_name(db, table)
        stmts = build_merge_sql(
            target=table, stage=stage, columns=df.columns, keys=keys,
            skip_delete=skip_delete,
        )
        props = {"user": self.user, "password": self.password, "driver": self.driver}
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
