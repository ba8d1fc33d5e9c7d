"""Driver-contract twin: run every catalog query on Spark AND its DuckDB
oracle, compare row count + column names + TYPE FAMILIES + values
(order-insensitive), approximating the driver's t2 hash check.

The type-family check exists because the driver hashes TYPED values via
Arrow: DuckDB's ``sum(int)`` is HUGEINT, which Arrow lowers to float64,
while Spark emits int64 — equal values, different hash (the r3
`corpus_group_stats` red row). A str()-based value compare can't see
that, so the oracle is fetched through Arrow (exactly the driver's path)
and each column's Arrow type family must match Spark's schema family."""

import datetime
import math
import os

import duckdb
import pyarrow.types as pat
import pytest

from kafka_cdc_redshift_spark.plans import SPECS
from kafka_cdc_redshift_spark.sources.files import TABLES


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style normalization: floats to a fixed precision
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _spark_family(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return "list"
    return "other"


def _arrow_family(t):
    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_date(t):
        return "date"
    if pat.is_timestamp(t):
        return "ts"
    if pat.is_list(t) or pat.is_large_list(t):
        return "list"
    return "other"


def compare(spark_df, con, sql, name):
    cols = sorted(spark_df.columns)
    s_rows = [tuple(_canon(r[c]) for c in cols) for r in spark_df.collect()]

    # fetch through Arrow — the driver's own materialization path, so
    # DuckDB type widenings (HUGEINT -> float64 etc.) surface here too
    tbl = con.execute(sql).arrow()
    o_cols = list(tbl.column_names)
    assert sorted(o_cols) == cols, f"{name}: column mismatch spark={cols} oracle={sorted(o_cols)}"

    s_fams = {f.name: _spark_family(f.dataType) for f in spark_df.schema.fields}
    o_fams = {fld.name: _arrow_family(fld.type) for fld in tbl.schema}
    fam_mismatch = {
        c: (s_fams[c], o_fams[c]) for c in cols if s_fams[c] != o_fams[c]
    }
    assert not fam_mismatch, (
        f"{name}: type-family mismatch (spark, oracle): {fam_mismatch} — "
        "the driver's typed value-hash will disagree even if values are "
        "equal; CAST the oracle column to the Spark type family"
    )

    rows_py = tbl.to_pylist()
    o_rows = [tuple(_canon(row[c]) for c in cols) for row in rows_py]

    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    s_sorted, o_sorted = sorted(s_rows), sorted(o_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[:3]}"


def test_twin_catches_type_family_mismatch(spark, sf_dir):
    """Guard on the guard: a deliberately mis-typed oracle (DuckDB
    sum(int) -> HUGEINT -> Arrow float64 vs Spark int64) must FAIL the
    twin even though every value is numerically equal — exactly the bug
    class that produced the r3 corpus_group_stats red driver row."""
    sdf = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]).groupBy().agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum("v").alias("s")
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 20)) v(k, v)")
    with pytest.raises(AssertionError, match="type-family mismatch"):
        compare(sdf, con, "SELECT sum(v) AS s FROM t", "mis_typed")
    # and the CAST convention fixes it
    compare(sdf, con, "SELECT CAST(sum(v) AS BIGINT) AS s FROM t", "well_typed")


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker path)
        return
    compare(df, duck_con(sf_dir), spec.oracle, name)


# -- driver-SF twin ----------------------------------------------------------
# The driver checks at sf0.01 while this suite defaults to sf0.001; the r4
# corpus_stats_approx_audit red row was caused by a data shape (2-of-5 rows
# tied at a group median) that exists only at sf0.01. Close the gap: the
# queries pinned for this round's driver check ALSO run against the driver's
# own scale factor, so a data-dependent red row is caught pre-driver.
DRIVER_SF_DIR = os.environ.get("SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01")


def _driver_priority_names():
    from __spark_entry__ import _DRIVER_CHECK_FIRST

    return [n for n in dict.fromkeys(_DRIVER_CHECK_FIRST) if n in SPECS]


@pytest.mark.parametrize("name", _driver_priority_names())
def test_priority_query_matches_oracle_at_driver_sf(spark, name):
    if not os.path.isdir(DRIVER_SF_DIR):
        pytest.skip(f"{DRIVER_SF_DIR} not present")
    spec = SPECS[name]
    df = spec.spark(spark, DRIVER_SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, duck_con(DRIVER_SF_DIR), spec.oracle, name)


def test_approx_audit_tolerates_ties_at_median(spark, tmp_path):
    """Regression for the r4 red driver row: a group whose exact median
    value REPEATS. percentile_approx returns the exact median (rank
    interval [0.4, 0.8] under 2-of-5 ties), and the audit must treat a
    tied value's rank as that interval — the one-sided #(<=v)/n = 0.8
    read mis-flags a perfectly correct sketch."""
    rows = [
        (i, "t", "de", "src5", n)
        for i, n in enumerate([100, 200, 314, 314, 900])
    ]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sdf.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = SPECS["corpus_stats_approx_audit"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["p50_exact"] == 314.0
    assert out[0]["approx_within_bounds"] is True
