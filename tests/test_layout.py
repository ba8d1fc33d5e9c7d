"""Layout operators: range-clustered writes must enable file pruning, and
store compaction must shrink file counts without changing table contents."""

import pyspark.sql.functions as F
import pytest

from kafka_cdc_redshift_spark.operators.layout import (
    _dir_data_files,
    compact_table,
    write_range_layout,
)
from kafka_cdc_redshift_spark.sources import load_table
from kafka_cdc_redshift_spark.streaming.store import ParquetTargetStore


def test_range_layout_prunes_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_ts")
    write_range_layout(ev, out, range_cols=["ts"], num_files=8)

    written = spark.read.parquet(out)
    assert written.count() == ev.count()
    n_files = written.select(F.input_file_name()).distinct().count()
    assert n_files == 8

    # a narrow time filter must touch a small subset of the range-clustered
    # files (disjoint min/max per file -> zone-map pruning); grab an actual
    # narrow window from the data so the test is SF-independent
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 16
    touched = (
        written.filter(F.col("ts") <= F.lit(cut))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched <= 2, f"narrow scan touched {touched}/8 files"


def test_compact_table_shrinks_files_preserves_rows(spark, sf_dir, tmp_path):
    store = ParquetTargetStore(str(tmp_path / "store"))
    ev = load_table(spark, sf_dir, "events")
    # simulate many tiny per-batch files
    store.publish(ev.repartition(32), "events")
    before = _dir_data_files(store.path("events"))
    assert len(before) == 32

    v = compact_table(store, spark, "events", target_bytes=1 << 30)
    assert v is not None and v == 1
    after = _dir_data_files(store.path("events"))
    assert len(after) < len(before)

    compacted = store.read(spark, "events")
    assert compacted.count() == ev.count()
    # contents identical (exact set compare on the pk)
    a = {r[0] for r in ev.select("event_id").collect()}
    b = {r[0] for r in compacted.select("event_id").collect()}
    assert a == b


def test_compact_table_noop_when_already_compact(spark, sf_dir, tmp_path):
    store = ParquetTargetStore(str(tmp_path / "store2"))
    ev = load_table(spark, sf_dir, "events")
    store.publish(ev.coalesce(1), "events")
    assert compact_table(store, spark, "events", target_bytes=1 << 30) is None
    assert store.current_version("events") == 0


def test_compact_missing_table_is_none(spark, tmp_path):
    store = ParquetTargetStore(str(tmp_path / "store3"))
    assert compact_table(store, spark, "nope") is None


def test_zorder_layout_prunes_on_both_dims(spark, sf_dir, tmp_path):
    from kafka_cdc_redshift_spark.operators.layout import write_zorder_layout

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_z")
    write_zorder_layout(ev, out, zorder_cols=["user_id", "value"], num_files=16)

    written = spark.read.parquet(out)
    assert written.count() == ev.count()
    n_files = written.select(F.input_file_name()).distinct().count()
    assert n_files == 16

    # narrow rectangles on EITHER interleaved dimension prune files —
    # the property a single-column range layout cannot give both of
    u_lo, u_hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    v_lo, v_hi = ev.agg(F.min("value"), F.max("value")).first()
    u_cut = u_lo + (u_hi - u_lo) // 8
    v_cut = v_lo + (v_hi - v_lo) / 8
    for pred in (F.col("user_id") <= u_cut, F.col("value") <= v_cut):
        touched = (
            written.filter(pred).select(F.input_file_name()).distinct().count()
        )
        assert touched < n_files, f"{pred}: no pruning ({touched}/{n_files})"
    # and a rectangle on both dims prunes harder than either alone
    both = (
        written.filter((F.col("user_id") <= u_cut) & (F.col("value") <= v_cut))
        .select(F.input_file_name()).distinct().count()
    )
    assert both <= 8, f"2-dim rectangle touched {both}/16 files"


def test_zorder_empty_and_allnull_inputs(spark, sf_dir, tmp_path):
    """Empty input: write_zorder_layout degrades to a plain (schema-bearing)
    write and zorder_key raises the typed EmptyLayoutInput; an all-NULL
    z-order column on non-empty data is a caller error with a clear
    message (previously both died as TypeError on float(None))."""
    import pytest as _pytest

    from kafka_cdc_redshift_spark.operators.layout import (
        EmptyLayoutInput,
        write_zorder_layout,
        zorder_key,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    empty = ev.filter("1 = 0")
    with _pytest.raises(EmptyLayoutInput):
        zorder_key(empty, ["user_id", "value"])
    out = str(tmp_path / "z_empty")
    write_zorder_layout(empty, out, zorder_cols=["user_id", "value"])
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert set(back.columns) == set(ev.columns)

    allnull = ev.withColumn("value", F.lit(None).cast("double"))
    with _pytest.raises(ValueError, match="NULL in every row"):
        zorder_key(allnull, ["user_id", "value"])

    nonnum = ev.withColumn("value", F.lit("not-a-number"))
    with _pytest.raises(ValueError, match="non-numeric"):
        zorder_key(nonnum, ["user_id", "value"])


def test_compact_table_with_zorder_restores_clustering(spark, sf_dir, tmp_path):
    """Clustering compaction: per-batch CDC publishes fragment AND
    de-cluster a table; compact_table(zorder_cols=...) rides the
    already-paid rewrite to restore both — fewer files and file-level
    pruning on every z-order dimension."""
    from kafka_cdc_redshift_spark.operators.layout import compact_table

    store = ParquetTargetStore(str(tmp_path / "store"))
    ev = load_table(spark, sf_dir, "events")
    # simulate many tiny unclustered batch publishes
    store.publish(ev.repartition(24, "event_id"), "events")
    p0 = store.path("events")
    files0 = len(_dir_data_files(p0))
    assert files0 >= 20

    # size the target so compaction lands ~8 clustered files — enough to
    # measurably prune, still a real shrink from 24
    total = sum(sz for _, sz in _dir_data_files(p0))
    v = compact_table(
        store, spark, "events",
        target_bytes=max(total // 8, 1),
        zorder_cols=["user_id", "value"],
    )
    assert v == 1
    back = store.read(spark, "events")
    assert back.count() == ev.count()
    files1 = len(_dir_data_files(store.path("events")))
    assert files1 < files0

    # pruning on both clustered dimensions after compaction
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files > 1
    u_lo, u_hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    v_lo, v_hi = ev.agg(F.min("value"), F.max("value")).first()
    for pred in (
        F.col("user_id") <= u_lo + (u_hi - u_lo) // 8,
        F.col("value") <= v_lo + (v_hi - v_lo) / 8,
    ):
        touched = (
            back.filter(pred).select(F.input_file_name()).distinct().count()
        )
        assert touched < n_files, f"{pred}: no pruning ({touched}/{n_files})"


def test_compact_table_misconfigured_zorder_degrades_to_size_only(
    spark, sf_dir, tmp_path
):
    """A permanently bad zorder_columns entry (nonexistent column,
    all-NULL column, non-numeric column) must not wedge the maintenance
    cycle: compact_table degrades to a plain size-only compaction with a
    warning instead of raising on every cycle while small files accrue
    (clustering is an optimization; compaction is not)."""
    from kafka_cdc_redshift_spark.operators.layout import compact_table

    ev = load_table(spark, sf_dir, "events")
    for bad_cols in (["no_such_column"], ["event_type"]):  # missing / non-numeric
        store = ParquetTargetStore(str(tmp_path / f"store_{bad_cols[0]}"))
        store.publish(ev.repartition(16), "events")
        assert len(_dir_data_files(store.path("events"))) == 16
        v = compact_table(
            store, spark, "events", target_bytes=1 << 30, zorder_cols=bad_cols
        )
        assert v == 1  # compaction still happened
        assert len(_dir_data_files(store.path("events"))) < 16
        assert store.read(spark, "events").count() == ev.count()
