"""functions/timeseries.moving_window_agg: block-partitioned moving
frames with a p-row halo must equal the single-window spelling
row-for-row, across halo-heavy block sizes, and must never key a
corpus-sized window by the bare low-cardinality series."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_cdc_redshift_spark.functions.timeseries import moving_window_agg


def _aggs():
    return {
        "mv_sum": F.sum("v"),
        "mv_n": F.count(F.lit(1)),
        "mv_min": F.min("v"),
    }


@pytest.mark.parametrize("p,b", [(4, 8), (0, 16), (7, 8), (3, 64)])
def test_moving_window_agg_equals_plain_window(spark, p, b):
    rows = [(f"s{i % 3}", i * 7 % 101, float(i % 17)) for i in range(500)]
    df = spark.createDataFrame(rows, "series string, t int, v double")
    got = moving_window_agg(
        df, ["series"], ["t", "v"], _aggs(), preceding=p, block=b
    )
    w = Window.partitionBy("series").orderBy("t", "v").rowsBetween(-p, 0)
    want = df.select(
        "*",
        F.sum("v").over(w).alias("mv_sum"),
        F.count(F.lit(1)).over(w).alias("mv_n"),
        F.min("v").over(w).alias("mv_min"),
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_moving_window_agg_rejects_halo_deeper_than_block(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "series string, t int, v double")
    with pytest.raises(ValueError, match="preceding"):
        moving_window_agg(
            df, ["series"], ["t", "v"], _aggs(), preceding=8, block=8
        )


def test_moving_window_agg_plan_is_block_keyed(spark, sf_dir):
    """Every frame window over the corpus partitions by (series, block),
    never the bare series — the per-series single-reducer shape."""
    import re

    from kafka_cdc_redshift_spark.plans import SPECS

    plan = (
        SPECS["events_series_moving_avg"].spark(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "event_type" in spec and "__rnk" in spec:
            assert "__blk" in spec.split("event_type")[1] or \
                "__blk" in spec.split("event_type")[0]


def test_range_partitioned_rank_multi_split_input(spark, sf_dir):
    """Regression: the rank helper's census and ranked output must
    observe the SAME range partitioning. Without the materialization
    barrier, a multi-split input (the events scan) can sample different
    range boundaries per consumer execution — offsets then describe a
    different partitioning than the ranks they are added to, and most
    ranks come out shifted."""
    from kafka_cdc_redshift_spark.plans.catalog import load_table
    from kafka_cdc_redshift_spark.util import range_partitioned_rank

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    r = range_partitioned_rank(
        ev, ["event_type"], ["ts", "event_id"], rank_col="rnk", n_col="n"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    truth = ev.withColumn("true_rnk", F.row_number().over(w))
    j = r.join(truth, ["event_id", "event_type", "ts"])
    assert j.filter(F.col("rnk") != F.col("true_rnk")).count() == 0
    assert j.count() == ev.count()


def test_range_partitioned_rank_null_partition_keys(spark):
    """Regression (r9 advisor): NULL is a normal window partition, so a
    NULL partition-key row must neither vanish through the offsets join
    (null-unsafe equi-join) nor rank apart from the window spelling.
    NULL order values must also keep their NULLS FIRST position."""
    from kafka_cdc_redshift_spark.util import range_partitioned_rank

    rows = [
        (None, 5, 1), (None, 3, 2), ("a", None, 3), ("a", 1, 4),
        ("a", 9, 5), ("b", 2, 6), (None, None, 7), ("b", 2, 8),
    ]
    df = spark.createDataFrame(rows, "k string, v int, id int")
    r = range_partitioned_rank(df, ["k"], ["v", "id"],
                               rank_col="rnk", n_col="n")
    assert r.count() == len(rows)  # nothing dropped
    w = Window.partitionBy("k").orderBy("v", "id")
    truth = df.withColumn("true_rnk", F.row_number().over(w))
    j = r.join(truth, ["id"])
    assert j.filter(F.col("rnk") != F.col("true_rnk")).count() == 0
    # and each group's n is its true size (NULL group included)
    got_n = {r_.k: r_.n for r_ in r.select("k", "n").distinct().collect()}
    assert got_n == {None: 3, "a": 3, "b": 2}


def test_range_partitioned_rank_no_corpus_checkpoint(spark, sf_dir):
    """The boundary-explicit spelling derives the bucket id from the ROW
    against sampled literal boundaries, so determinism needs no
    materialization barrier: the plan must contain no checkpointed RDD
    scan (the old spelling localCheckpoint'ed the whole corpus per rank
    call) and no Python batches."""
    from kafka_cdc_redshift_spark.plans.catalog import load_table
    from kafka_cdc_redshift_spark.util import range_partitioned_rank

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    r = range_partitioned_rank(
        ev, ["event_type"], ["ts", "event_id"], rank_col="rnk", n_col="n"
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan


def test_running_agg_matches_window_on_multi_split_input(spark, sf_dir):
    """The two-pass block prefix scan must replay the running-frame
    window row-for-row on a real multi-split table (the boundary
    lesson from range_partitioned_rank): running sum AND carry-forward
    last, including null values (SQL SUM/last_value IGNORE NULLS
    semantics)."""
    from kafka_cdc_redshift_spark.functions.timeseries import running_agg
    from kafka_cdc_redshift_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts",
        # every third value null: exercises the null-prefix edge in
        # both aggregates; decimal so the sum is associative (a DOUBLE
        # running sum is reassociated by the block partials — the
        # documented partial-aggregation caveat)
        F.when(
            F.col("event_id") % 3 != 0,
            F.col("value").cast("decimal(18,2)"),
        ).alias("v"),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("vd"),
    )
    got = running_agg(
        ev, ["event_type"], ["ts", "event_id"],
        sums={"run_sum": "v", "run_sum_dbl": "vd"}, lasts={"run_last": "v"},
        allow_double_sums=True,
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = ev.select(
        "event_id",
        F.sum("v").over(w).alias("true_sum"),
        F.sum("vd").over(w).alias("true_sum_dbl"),
        F.last("v", ignorenulls=True).over(w).alias("true_last"),
    )
    j = got.join(want, "event_id")
    assert j.count() == ev.count()
    bad = j.filter(
        ~F.col("run_sum").eqNullSafe(F.col("true_sum"))
        | ~F.col("run_last").eqNullSafe(F.col("true_last"))
    )
    assert bad.count() == 0
    # double sums: equal to the sequential fold within float tolerance
    bad_dbl = j.filter(
        F.col("run_sum_dbl").isNotNull()
        & (
            F.abs(F.col("run_sum_dbl") - F.col("true_sum_dbl"))
            > F.lit(1e-9) * F.greatest(F.abs("true_sum_dbl"), F.lit(1.0))
        )
    )
    assert bad_dbl.count() == 0
    assert j.filter(
        F.col("run_sum_dbl").isNull() != F.col("true_sum_dbl").isNull()
    ).count() == 0


def test_running_agg_null_partition_keys(spark):
    """NULL series keys form a normal window partition: nothing drops
    through the offsets join, and the running values match the window
    spelling."""
    from kafka_cdc_redshift_spark.functions.timeseries import running_agg

    rows = [
        (None, 1, 10), (None, 2, None), (None, 3, 5),
        ("a", 1, None), ("a", 2, 7), ("b", 1, 1),
    ]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    got = running_agg(df, ["k"], ["t"], sums={"s": "v"}, lasts={"l": "v"})
    assert got.count() == len(rows)
    w = (
        Window.partitionBy("k").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "k", "t",
        F.sum("v").over(w).alias("ts"),
        F.last("v", ignorenulls=True).over(w).alias("tl"),
    )
    j = got.alias("g").join(
        want.alias("w"),
        F.col("g.k").eqNullSafe(F.col("w.k")) & (F.col("g.t") == F.col("w.t")),
    )
    assert j.count() == len(rows)
    assert j.filter(
        ~F.col("g.s").eqNullSafe(F.col("w.ts"))
        | ~F.col("g.l").eqNullSafe(F.col("w.tl"))
    ).count() == 0


def test_asof_join_low_cardinality_matches_default(spark, sf_dir):
    """asof_join(low_cardinality=True) routes the carry-forward through
    the block prefix scan — output must equal the union+window default
    on a low-cardinality key."""
    from kafka_cdc_redshift_spark.operators.asof import asof_join
    from kafka_cdc_redshift_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    # right side: one state row per (event_type, hour) — unique key+time
    # so the match is deterministic in both spellings
    state = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("state_ts")
    ).agg(F.count(F.lit(1)).alias("hour_n"))
    kw = dict(on=["event_type"], left_time="ts", right_time="state_ts")
    base = asof_join(ev, state, **kw)
    scan = asof_join(ev, state, low_cardinality=True, **kw)
    assert base.count() == ev.count() and scan.count() == ev.count()
    j = base.select(
        "event_id", F.col("hour_n").alias("base_n")
    ).join(scan.select("event_id", "hour_n"), "event_id")
    assert j.filter(~F.col("hour_n").eqNullSafe(F.col("base_n"))).count() == 0


def test_gapfill_locf_no_per_series_reducer(spark, sf_dir):
    """events_gapfill_locf's carry-forward must run block-partitioned:
    every window over the grid keys (pid, event_type), never event_type
    alone (the last UNBOUNDED-frame engine path without a scale-safe
    spelling, VERDICT r8 missing #3)."""
    import re

    from kafka_cdc_redshift_spark.plans import SPECS

    plan = (
        SPECS["events_gapfill_locf"].spark(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "event_type" in spec and ("sv" in spec or "__locf" in spec):
            assert "pid" in spec.split("event_type")[0]


def test_stamp_range_bucket_tree_is_exact_count_below(spark):
    """The balanced comparison tree must stamp exactly the canonical
    bucket id — the count of sampled boundary tuples strictly below the
    row's key — at a boundary count far past the default P (the linear
    when-chain it replaced grew per-row cost with P and could overflow
    the JVM stack building the plan near P≈512). NULL key fields land
    in bucket 0 (NULLS FIRST)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from kafka_cdc_redshift_spark.util import (
        _sampled_range_bounds,
        stamp_range_bucket,
    )

    rows = [Row(k=i % 37, o=i) for i in range(4000)] + [
        Row(k=None, o=-1), Row(k=None, o=99999)
    ]
    df = spark.createDataFrame(rows, "k int, o long")
    P = 97
    bounds = _sampled_range_bounds(df, ["k", "o"], P)
    assert len(bounds) > 50  # the sample actually produced a wide ladder
    got = {
        (r.k, r.o): r["__pid"]
        for r in stamp_range_bucket(df, ["k", "o"], P).collect()
    }
    for r in rows:
        if r.k is None:
            assert got[(r.k, r.o)] == 0
        else:
            want = sum(1 for b in bounds if (r.k, r.o) > b)
            assert got[(r.k, r.o)] == want, (r, want, got[(r.k, r.o)])


def test_running_agg_refuses_silent_double_sums(spark):
    """A float/double sums leg reassociates silently; it must be an
    explicit opt-in (allow_double_sums=True), not a quiet default."""
    import pytest

    from kafka_cdc_redshift_spark.functions.timeseries import running_agg

    df = spark.createDataFrame(
        [(1, 1, 1.5), (1, 2, 2.5)], "k int, t int, v double"
    )
    with pytest.raises(ValueError, match="allow_double_sums"):
        running_agg(df, ["k"], ["t"], sums={"s": "v"})
    # the opt-in works; decimal needs no flag
    assert running_agg(
        df, ["k"], ["t"], sums={"s": "v"}, allow_double_sums=True
    ).count() == 2
    from pyspark.sql import functions as F

    assert running_agg(
        df, ["k"], ["t"], sums={"s": F.col("v").cast("decimal(18,2)")}
    ).count() == 2
