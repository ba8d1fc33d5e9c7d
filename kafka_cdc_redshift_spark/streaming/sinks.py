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

import os
import shutil
import uuid
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


#: COPY `NULL AS` token for the staged CSV — an explicit token (not the
#: empty string) so SQL NULL never collides with a genuinely empty string
#: field after the quote-stripping COPY applies to quoted fields.
BULK_NULL_TOKEN = "@NULL@"


def bulk_stage_csv_options(bulk: BulkLoadOptions) -> dict[str, str]:
    """The staged-file format both bulk transports share: RFC 4180 CSV
    (quote-doubling escape — what COPY's CSV mode expects), an explicit
    NULL token, and ISO date/timestamp text that the generated
    `dateformat 'auto' timeformat 'auto'` COPY options accept. Declared
    once so the filesystem twin stages byte-compatible files with the
    S3 path's COPY contract."""
    # Known token-collision caveat (inherent to COPY's `NULL AS` too): a
    # string field whose VALUE is exactly the null token reads back as
    # SQL NULL — the token is chosen to make that practically impossible
    # for real data, matching the connector's convention.
    opts = {
        "header": "false",
        "nullValue": BULK_NULL_TOKEN,
        "quote": '"',
        "escape": '"',
        # read-side: records may span lines (quoted embedded newlines —
        # COPY's CSV mode handles them natively, Spark's reader needs the
        # flag); ignored on write
        "multiLine": "true",
        # non-finite doubles: the writer emits Java Double.toString
        # ("Infinity"/"-Infinity"), but the reader's DEFAULT tokens are
        # "Inf"/"-Inf" — without pinning these, infinite values silently
        # null out on the read side of the staged load
        "positiveInf": "Infinity",
        "negativeInf": "-Infinity",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "dateFormat": "yyyy-MM-dd",
    }
    fmt = bulk.tempformat.upper()
    if fmt == "CSV GZIP":
        opts["compression"] = "gzip"
    elif fmt != "CSV":
        # the staged-file twin speaks CSV only; a JSON-configured job must
        # not silently stage a different format than it declared — the
        # connector path honors JSON, so dispatch there or reconfigure
        raise ValueError(
            f"filesystem bulk staging supports tempformat CSV / CSV GZIP, "
            f"not {bulk.tempformat!r} — use an object-store tempdir (the "
            f"COPY connector honors JSON) or set tempformat='CSV'"
        )
    return opts


def is_object_store_path(path: str) -> bool:
    """True for s3://, s3a://, gs://, abfss://... staging prefixes — the
    transports that need the warehouse-side COPY connector. Plain paths
    and file:// URIs stage through the filesystem twin."""
    scheme, sep, _ = path.partition("://")
    return bool(sep) and scheme.lower() not in ("file", "local")


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
    dialect: str = "redshift",
    portable: bool = False,
) -> list[str]:
    """Transactional post-actions for one staged batch.

    `dialect="redshift"` (default) reproduces the reference's statement
    shape (DELETE USING + re-deduped INSERT, redshift_sink.py:477-509).
    `dialect="ansi_merge"` emits one standard `MERGE INTO` instead —
    runnable on engines with full SQL:2008 MERGE (Derby, Postgres 15+;
    executed live against embedded Derby in the test suite). NOTE: it
    uses multiple refined WHEN MATCHED branches and a refined WHEN NOT
    MATCHED, which Redshift's restricted MERGE (one matched + one
    not-matched clause, no refinement predicates) does not accept — the
    `redshift` dialect is the documented Redshift path.
    The MERGE form relies on the stage being unique per key (the
    pipeline lww_dedups before staging; a duplicate key trips the
    engine's standard MERGE cardinality error instead of the redshift
    dialect's in-SQL re-dedup guard).
    `dialect="delete_insert"` is the reference's DELETE-then-INSERT
    statement SHAPE in portable SQL:2003 — correlated-EXISTS delete plus
    DISTINCT INSERT SELECT — so the reference's merge strategy itself
    (not just the MERGE INTO rewrite) is executable and execution-tested
    on engines without Redshift's syntax extensions (live on Derby).
    `dialect="redshift_merge"` emits the RESTRICTED MERGE shape Redshift
    actually accepts — exactly one unrefined WHEN MATCHED and one
    unrefined WHEN NOT MATCHED clause — with delete images applied ahead
    of the merge (see _build_redshift_merge_sql); the restricted shape is
    also valid SQL:2008, so it is execution-tested live on Derby.

    `portable` (redshift_merge only): False (default) emits the spellings
    real Redshift runs — `WHERE 1 = 3` CTAS (Redshift CTAS has no WITH NO
    DATA) and a transactional `DELETE FROM stage` cleanup (TRUNCATE
    implicitly COMMITS on Redshift, breaking the BEGIN/END atomicity);
    True keeps the SQL-standard spellings (WITH NO DATA CTAS, TRUNCATE)
    the live Derby tests execute.
    """
    if dialect == "ansi_merge":
        return _build_ansi_merge_sql(
            target=target, stage=stage, columns=columns, keys=keys,
            op_col=op_col, delete_op=delete_op, skip_delete=skip_delete,
            bootstrap=bootstrap,
        )
    if dialect == "delete_insert":
        return _build_delete_insert_sql(
            target=target, stage=stage, columns=columns, keys=keys,
            op_col=op_col, delete_op=delete_op, skip_delete=skip_delete,
            bootstrap=bootstrap,
        )
    if dialect == "redshift_merge":
        return _build_redshift_merge_sql(
            target=target, stage=stage, columns=columns, keys=keys,
            op_col=op_col, delete_op=delete_op, skip_delete=skip_delete,
            bootstrap=bootstrap, portable=portable,
        )
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


def _build_ansi_merge_sql(
    *,
    target: str,
    stage: str,
    columns: Sequence[str],
    keys: Sequence[str],
    op_col: str,
    delete_op: str,
    skip_delete: bool,
    bootstrap: bool,
) -> list[str]:
    """SQL:2003 MERGE form of the staged upsert (see build_merge_sql).

    Semantics match the redshift dialect on a key-deduped stage:
    matched + delete-image -> DELETE (unless skip_delete), matched ->
    UPDATE, not-matched non-delete -> INSERT. Bootstrap is a WITH NO DATA
    CTAS (no IF NOT EXISTS in the standard — run_sql tolerates the
    already-exists error on CREATE statements)."""
    cols_no_op = [c for c in columns if c != op_col]  # op never lands (P5)
    collist = ", ".join(_q(c) for c in cols_no_op)
    on = merge_condition(stage, target, keys)
    set_cols = [c for c in cols_no_op if c not in keys]
    # the op column is staged as whatever the writer's string mapping is
    # (CLOB on Derby, which '=' can't compare) — CAST to VARCHAR for the
    # refinement predicates; a no-op on engines that staged VARCHAR
    op_ref = f"CAST({stage}.{_q(op_col)} AS VARCHAR(32))"
    stmts: list[str] = []
    if bootstrap:
        stmts.append(
            f"CREATE TABLE {target} AS "
            f"SELECT {collist} FROM {stage} WITH NO DATA"
        )
    stmts.append("BEGIN")
    merge = [f"MERGE INTO {target} USING {stage} ON {on}"]
    if not skip_delete:
        merge.append(
            f"WHEN MATCHED AND {op_ref} = '{delete_op}' THEN DELETE"
        )
    if set_cols:
        merge.append(
            "WHEN MATCHED THEN UPDATE SET "
            + ", ".join(f"{_q(c)} = {stage}.{_q(c)}" for c in set_cols)
        )
    not_matched = "" if skip_delete else f" AND {op_ref} <> '{delete_op}'"
    merge.append(
        f"WHEN NOT MATCHED{not_matched} THEN INSERT ({collist}) VALUES ("
        + ", ".join(f"{stage}.{_q(c)}" for c in cols_no_op)
        + ")"
    )
    stmts.append(" ".join(merge))
    stmts.append(f"TRUNCATE TABLE {stage}")
    stmts.append("END")
    return stmts


def _build_delete_insert_sql(
    *,
    target: str,
    stage: str,
    columns: Sequence[str],
    keys: Sequence[str],
    op_col: str,
    delete_op: str,
    skip_delete: bool,
    bootstrap: bool,
) -> list[str]:
    """Portable SQL:2003 form of the reference's DELETE-then-INSERT merge
    (the `redshift` dialect's statement SHAPE, redshift_sink.py:477-509)
    with the warehouse-only syntax replaced: a correlated-EXISTS DELETE
    instead of `DELETE ... USING`, a `WITH NO DATA` CTAS instead of
    `CREATE TABLE IF NOT EXISTS ... AS` (run_sql tolerates the
    already-exists error), and a DISTINCT projection instead of the
    in-SQL ROW_NUMBER re-dedup guard (W6) — Derby's window support has no
    PARTITION BY. DISTINCT collapses the guard's actual W6 case (a
    re-staged batch's identical rows); same-key-DIFFERENT-payload
    duplicates still rely on the pipeline's lww_dedup-before-staging
    contract: unlike MERGE they trip no engine cardinality error and
    would all land in the target.
    Executed live against embedded Derby in the test suite."""
    cols_no_op = [c for c in columns if c != op_col]  # op never lands (P5)
    collist = ", ".join(_q(c) for c in cols_no_op)
    on = merge_condition(stage, target, keys)
    # CLOB-staged op columns can't be compared with '=' on Derby (see
    # _build_ansi_merge_sql) — CAST for the filter predicate
    op_ref = f"CAST({_q(op_col)} AS VARCHAR(32))"
    stmts: list[str] = []
    if bootstrap:
        stmts.append(
            f"CREATE TABLE {target} AS "
            f"SELECT {collist} FROM {stage} WITH NO DATA"
        )
    stmts.append("BEGIN")
    stmts.append(
        f"DELETE FROM {target} WHERE EXISTS "
        f"(SELECT 1 FROM {stage} WHERE {on})"
    )
    delete_filter = "" if skip_delete else f" WHERE {op_ref} <> '{delete_op}'"
    stmts.append(
        f"INSERT INTO {target} ({collist}) "
        f"SELECT DISTINCT {collist} FROM {stage}{delete_filter}"
    )
    stmts.append(f"TRUNCATE TABLE {stage}")
    stmts.append("END")
    return stmts


def _build_redshift_merge_sql(
    *,
    target: str,
    stage: str,
    columns: Sequence[str],
    keys: Sequence[str],
    op_col: str,
    delete_op: str,
    skip_delete: bool,
    bootstrap: bool,
    portable: bool,
) -> list[str]:
    """Redshift's RESTRICTED MERGE: the engine accepts exactly one
    WHEN MATCHED clause and one WHEN NOT MATCHED clause, neither with a
    refinement predicate — so the ansi_merge dialect's refined branches
    (`WHEN MATCHED AND op = 'd' THEN DELETE`) are rejected there. This
    dialect completes the merge-strategy matrix with the shape Redshift
    actually runs:

      1. delete images are applied BEFORE the merge: delete matching
         target keys (portable correlated-EXISTS — valid on Redshift and
         SQL:2008 engines alike), then delete the images from the stage
         so the unrefined MERGE cannot re-insert them (the stage is
         transaction-local and truncated after the merge anyway);
      2. one restricted `MERGE INTO ... WHEN MATCHED THEN UPDATE ...
         WHEN NOT MATCHED THEN INSERT ...` upserts the remainder.

    Under skip_delete, step 1 is skipped and delete images upsert like
    any row — identical semantics to the other dialects. The stage must
    be key-deduped (the pipeline lww_dedups before staging); a duplicate
    key trips the engine's MERGE cardinality error.

    `portable=False` (default — the spellings real Redshift runs):
    `WHERE 1 = 3` / IF-NOT-EXISTS CTAS (Redshift CTAS rejects WITH NO
    DATA) and a transactional `DELETE FROM stage` cleanup — on Redshift
    TRUNCATE inside BEGIN/END implicitly COMMITS, which would silently
    break the delete+merge atomicity this dialect exists to provide.
    `portable=True` keeps the SQL-standard WITH-NO-DATA CTAS and
    TRUNCATE: the restricted MERGE is valid SQL:2008, so that whole
    statement list is execution-tested live on embedded Derby (which has
    no WHERE-1=3 CTAS)."""
    cols_no_op = [c for c in columns if c != op_col]  # op never lands (P5)
    collist = ", ".join(_q(c) for c in cols_no_op)
    on = merge_condition(stage, target, keys)
    set_cols = [c for c in cols_no_op if c not in keys]
    # CLOB-staged op columns can't be '='-compared on Derby — CAST, a
    # no-op on engines that staged VARCHAR (see _build_ansi_merge_sql)
    op_ref = f"CAST({_q(op_col)} AS VARCHAR(32))"
    stmts: list[str] = []
    if bootstrap:
        stmts.append(
            f"CREATE TABLE {target} AS "
            f"SELECT {collist} FROM {stage} WITH NO DATA"
            if portable else
            f"CREATE TABLE IF NOT EXISTS {target} AS "
            f"SELECT {collist} FROM {stage} WHERE 1 = 3"
        )
    stmts.append("BEGIN")
    if not skip_delete:
        stmts.append(
            f"DELETE FROM {target} WHERE EXISTS "
            f"(SELECT 1 FROM {stage} WHERE {on} "
            f"AND CAST({stage}.{_q(op_col)} AS VARCHAR(32)) = '{delete_op}')"
        )
        stmts.append(
            f"DELETE FROM {stage} WHERE {op_ref} = '{delete_op}'"
        )
    # exactly ONE unrefined matched + ONE unrefined not-matched clause —
    # the restricted shape. All-key tables update a key to itself (a
    # no-op) because the restricted form requires both clauses.
    sets = ", ".join(
        f"{_q(c)} = {stage}.{_q(c)}" for c in (set_cols or [keys[0]])
    )
    stmts.append(
        f"MERGE INTO {target} USING {stage} ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ("
        + ", ".join(f"{stage}.{_q(c)}" for c in cols_no_op)
        + ")"
    )
    # stage cleanup: DELETE is transactional on every engine; TRUNCATE
    # implicitly commits on Redshift (kept only for the portable path,
    # matching the other Derby-tested dialects)
    stmts.append(
        f"TRUNCATE TABLE {stage}" if portable else f"DELETE FROM {stage}"
    )
    stmts.append("END")
    return stmts


class JdbcMergeSink:
    def __init__(self, url: str, *, user: str, password: str,
                 driver: str = "org.postgresql.Driver",
                 batchsize: int = 10_000,
                 bulk: BulkLoadOptions | None = None,
                 dialect: str = "redshift",
                 extra_jdbc_props: dict[str, str] | None = None,
                 portable_sql: bool | None = None):
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
        # "redshift" (reference statement shape, warehouse syntax),
        # "ansi_merge" (standard MERGE INTO — Derby/Postgres 15+),
        # "delete_insert" (reference shape in portable SQL:2003), or
        # "redshift_merge" (Redshift's RESTRICTED MERGE: one unrefined
        # matched + one unrefined not-matched clause, deletes pre-applied)
        self.dialect = dialect
        # forwarded to the Spark JDBC writer (e.g. createTableColumnTypes
        # to keep strings VARCHAR on engines whose default mapping is CLOB)
        self.extra_jdbc_props = dict(extra_jdbc_props or {})
        # redshift_merge spelling choice (see build_merge_sql `portable`):
        # None auto-detects — SQL-standard spellings for embedded Derby
        # (the live test engine), Redshift-native spellings otherwise
        self.portable_sql = (
            "derby" in url.lower() if portable_sql is None else portable_sql
        )

    def _props(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "batchsize": str(self.batchsize),
            **self.extra_jdbc_props,
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

    # engine-agnostic "object exists / missing" signatures: Derby SQLStates
    # plus the common message substrings (Postgres family)
    _EXISTS_ERRS = ("X0Y32", "already exists")
    _MISSING_ERRS = ("42Y55", "42X05", "does not exist")

    def run_sql(self, spark, statements: Sequence[str], *,
                tolerate_ddl: bool = False) -> None:
        """Execute the statement list. "BEGIN"/"END" markers are mapped to
        the JDBC transaction API (setAutoCommit(False) / commit()) — the
        portable form of the reference's server-side BEGIN...END: with
        driver-side autocommit the literal statements would NOT bracket
        one transaction, and an exception mid-list now rolls back on
        close instead of leaving half a merge applied. With
        `tolerate_ddl`, a CREATE TABLE hitting already-exists or a DROP
        TABLE hitting not-exists is skipped (standard SQL has no IF NOT
        EXISTS; the redshift dialect bakes it into the statement)."""
        conn = self._connection(spark)
        try:
            st = conn.createStatement()
            for sql in statements:
                if sql == "BEGIN":
                    conn.setAutoCommit(False)
                    continue
                if sql == "END":
                    conn.commit()
                    conn.setAutoCommit(True)
                    continue
                try:
                    st.execute(sql)
                except Exception as e:  # noqa: BLE001
                    msg = str(e)
                    head = sql.lstrip().upper()
                    if tolerate_ddl and head.startswith("CREATE TABLE") and any(
                        s in msg for s in self._EXISTS_ERRS
                    ):
                        continue
                    if tolerate_ddl and head.startswith("DROP TABLE") and any(
                        s in msg for s in self._MISSING_ERRS
                    ):
                        continue
                    raise
        finally:
            try:
                if not conn.getAutoCommit():
                    conn.rollback()  # abort a half-applied transaction
                    conn.setAutoCommit(True)
            except Exception:  # noqa: BLE001 - close() is the priority
                pass
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
            if is_object_store_path(self.bulk.tempdir):
                write_bulk_staged(
                    df, url=self.url, db=db, table=table, keys=keys,
                    user=self.user, password=self.password, bulk=self.bulk,
                    skip_delete=skip_delete,
                )
            else:
                self._apply_bulk_fs(
                    df, db=db, table=table, keys=keys,
                    skip_delete=skip_delete,
                )
            return
        spark = df.sparkSession
        stage = stage_table_name(db, table)
        stmts = build_merge_sql(
            target=table, stage=stage, columns=df.columns, keys=keys,
            skip_delete=skip_delete, dialect=self.dialect,
            portable=self.portable_sql,
        )
        props = self._props()
        tolerant = self.dialect in (
            "ansi_merge", "delete_insert", "redshift_merge"
        )
        drop_stage = (
            f"DROP TABLE {stage}" if tolerant else f"DROP TABLE IF EXISTS {stage}"
        )
        try:
            df.write.jdbc(self.url, stage, mode="append", properties=props)
            self.run_sql(spark, stmts, tolerate_ddl=tolerant)
        except JdbcUnavailable:
            raise
        except Exception:
            if not retry:
                raise
            self.run_sql(spark, [drop_stage], tolerate_ddl=True)
            df.write.jdbc(self.url, stage, mode="append", properties=props)
            self.run_sql(spark, stmts, tolerate_ddl=tolerant)

    def _apply_bulk_fs(
        self,
        df: DataFrame,
        *,
        db: str,
        table: str,
        keys: Sequence[str],
        skip_delete: bool = False,
    ) -> None:
        """Filesystem twin of the S3+COPY bulk path (`write_bulk_staged`),
        taken when `bulk.tempdir` is a plain filesystem prefix: stage the
        batch as the SHARED staged-CSV format (`bulk_stage_csv_options` —
        RFC 4180 quote-doubling, explicit NULL token, auto-parseable
        date/timestamp text), load the staged files into the stage table,
        and run the merge post-actions as ONE warehouse transaction — the
        same stage -> COPY -> postactions contract as the reference
        (cdc_util/redshift_sink.py:514-527) with only the transport
        swapped. This makes the staging-format fidelity and the
        transactional sequencing live-testable (embedded Derby) without
        the connector jar, and gives on-prem deployments whose staging
        area is NFS a working bulk path; s3://-style prefixes dispatch to
        the connector instead (see apply_batch)."""
        assert self.bulk is not None
        spark = df.sparkSession
        stage = stage_table_name(db, table)
        stmts = build_merge_sql(
            target=table, stage=stage, columns=df.columns, keys=keys,
            skip_delete=skip_delete, dialect=self.dialect,
            portable=self.portable_sql,
        )
        csv_opts = bulk_stage_csv_options(self.bulk)
        root = self.bulk.tempdir
        local_root = root[len("file://"):] if root.startswith("file://") else root
        stage_dir = os.path.abspath(
            os.path.join(local_root, f"{stage}_{uuid.uuid4().hex}")
        )
        # Spark resolves a plain path against fs.defaultFS while
        # shutil.rmtree always deletes from the driver-local disk; stage
        # through an explicit file:// URI so the write, the COPY-twin
        # read, and the cleanup all target the SAME filesystem even on a
        # cluster whose defaultFS is HDFS/object storage
        stage_uri = "file://" + stage_dir
        tolerant = self.dialect in (
            "ansi_merge", "delete_insert", "redshift_merge"
        )
        drop_stage = (
            f"DROP TABLE {stage}" if tolerant
            else f"DROP TABLE IF EXISTS {stage}"
        )

        def load_and_merge():
            # the warehouse COPY stand-in: the STAGED BYTES are what load
            # (re-read with the declared format, schema from the batch),
            # so a staging-format infidelity fails the merge result, not
            # just a unit assertion
            staged = spark.read.schema(df.schema).options(**csv_opts).csv(
                stage_uri
            )
            staged.write.jdbc(
                self.url, stage, mode="append", properties=self._props()
            )
            self.run_sql(spark, stmts, tolerate_ddl=tolerant)

        try:
            df.write.options(**csv_opts).mode("overwrite").csv(stage_uri)
            try:
                load_and_merge()
            except JdbcUnavailable:
                raise
            except Exception:
                # same crash-window contract as the JDBC path
                # (redshift_sink.py:528-547): a prior half-written stage
                # table (or this attempt's) poisons the merge — drop it
                # and retry once from the staged files
                self.run_sql(spark, [drop_stage], tolerate_ddl=True)
                load_and_merge()
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)

    def append_table(self, df: DataFrame, table: str) -> None:
        """Plain batched append (the <table>_delete stream,
        redshift_sink.py:242-253)."""
        df.write.jdbc(self.url, table, mode="append", properties=self._props())

    def fetch_catalog_columns(
        self, spark, table: str, schema: str | None = None
    ) -> list[tuple[str, str]]:
        """Portable live-catalog probe via JDBC DatabaseMetaData.getColumns —
        the engine-agnostic twin of `fetch_catalog_rows` (whose pg_table_def
        query only a Redshift/Postgres family target can answer). Works on
        any JDBC database (exercised live against Derby in the tests);
        returns the same (column, type string) rows for
        operators.schema_evolution.catalog_to_struct -> cast_to_target.

        Identifier case: unquoted DDL is case-folded by the engine (Derby
        uppercases), so the probe retries the folded spellings of `table`;
        column names come back exactly as stored (the Spark JDBC writer
        quotes them, preserving case)."""
        conn = self._connection(spark)
        try:
            md = conn.getMetaData()
            for cand in dict.fromkeys((table, table.upper(), table.lower())):
                rs = md.getColumns(None, schema, cand, None)
                rows: list[tuple[str, str]] = []
                while rs.next():
                    name = rs.getString("COLUMN_NAME")
                    tname = (rs.getString("TYPE_NAME") or "").lower()
                    size = rs.getInt("COLUMN_SIZE")
                    digits = rs.getInt("DECIMAL_DIGITS")
                    if tname in ("varchar", "character varying", "char",
                                 "character"):
                        tstr = f"character varying({size})"
                    elif tname in ("numeric", "decimal"):
                        tstr = f"numeric({size},{digits})"
                    else:
                        tstr = tname
                    rows.append((name, tstr))
                if rows:
                    return rows
            return []
        finally:
            conn.close()

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
