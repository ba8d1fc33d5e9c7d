"""Driver-contract twin: run every catalog query on Spark AND its DuckDB
oracle, compare row count + column names + values (order-insensitive),
approximating the driver's t2 hash check."""

import datetime
import math

import duckdb
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


def compare(spark_df, con, sql, name):
    cols = sorted(spark_df.columns)
    s_rows = [tuple(_canon(r[c]) for c in cols) for r in spark_df.collect()]

    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    assert sorted(o_cols) == cols, f"{name}: column mismatch spark={cols} oracle={sorted(o_cols)}"
    idx = [o_cols.index(c) for c in cols]
    o_rows = [tuple(_canon(row[i]) for i in idx) for row in res.fetchall()]

    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    s_sorted, o_sorted = sorted(s_rows), sorted(o_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker path)
        return
    compare(df, duck_con(sf_dir), spec.oracle, name)
