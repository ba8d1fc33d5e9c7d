"""asof_join unit semantics: backward match, ties, no-match nulls,
tolerance cutoff, and plan shape (one hash shuffle, no cartesian)."""

from datetime import datetime

from pyspark.sql import functions as F

from kafka_cdc_redshift_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 10), "e1"),
            (1, datetime(2024, 1, 20), "e2"),
            (2, datetime(2024, 1, 5), "e3"),   # before any right row
            (3, datetime(2024, 1, 5), "e4"),   # key with no right rows
        ],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 10), "r-tie"),   # equal time matches (<=)
            (1, datetime(2024, 1, 15), "r-mid"),
            (2, datetime(2024, 1, 8), "r-late"),
        ],
        "k long, rt timestamp, state string",
    )
    return left, right


def test_backward_asof_semantics(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt")
    got = {r.ev: r.state for r in out.collect()}
    assert got == {"e1": "r-tie", "e2": "r-mid", "e3": None, "e4": None}
    assert out.count() == left.count()  # left rows always preserved


def test_asof_tolerance(spark):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt", tolerance="2 days"
    )
    got = {r.ev: r.state for r in out.collect()}
    # e2 (Jan 20) vs r-mid (Jan 15) is 5 days back -> outside tolerance
    assert got == {"e1": "r-tie", "e2": None, "e3": None, "e4": None}


def test_asof_single_shuffle_no_cartesian(spark):
    left, right = _dfs(spark)
    plan = (
        asof_join(left, right, on=["k"], left_time="t", right_time="rt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union window only


def test_range_join_is_equi_not_cartesian(spark, sf_dir):
    from kafka_cdc_redshift_spark.plans import SPECS

    df = SPECS["events_range_join"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
