"""Streaming IVF index (streaming/ann_ingest.py): streamed ingest must
serve EXACTLY the batch ivf_topk results over the same corpus and
centroids, survive replays and restarts (persisted centroids), and
measure its own staleness (centroid_drift)."""

import pytest
from pyspark.sql import functions as F

from kafka_cdc_redshift_spark.functions import similarity
from kafka_cdc_redshift_spark.sources import load_table
from kafka_cdc_redshift_spark.streaming.ann_ingest import AnnIngest
from kafka_cdc_redshift_spark.streaming.store import AppendLog


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def centroids(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def _topk_key(r):
    return (r.q_id, r.rnk, r.neighbor_id, round(r.cos_sim, 9))


def test_streamed_index_serves_batch_ivf_results(
    spark, emb, centroids, queries, tmp_path
):
    want = sorted(
        map(_topk_key, similarity.ivf_topk(
            emb, queries, centroids, k=3, nprobe=2).collect())
    )
    assert want

    ann = AnnIngest(AppendLog(str(tmp_path / "state")), centroids=centroids)
    for b in range(3):
        ann.process_batch(emb.filter(F.col("vec_id") % 3 == b), b)
    got = sorted(map(_topk_key, ann.topk(queries, k=3, nprobe=2).collect()))
    assert got == want


def test_streamed_index_replay_and_restart(
    spark, emb, centroids, queries, tmp_path
):
    log = AppendLog(str(tmp_path / "state"))
    ann = AnnIngest(log, centroids=centroids)
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    ann.process_batch(b0, 0)
    ann.process_batch(b1, 1)
    n = log.read(spark, ann.cells_table).count()
    # at-least-once replay: a retried batch is a no-op
    ann.process_batch(b1, 1)
    assert log.read(spark, ann.cells_table).count() == n

    # restart: a fresh AnnIngest over the same log recovers the SAME
    # persisted centroids and serves identical results
    ann2 = AnnIngest(AppendLog(str(tmp_path / "state")))
    got2 = sorted(map(_topk_key, ann2.topk(queries, k=3, nprobe=2).collect()))
    want = sorted(
        map(_topk_key, similarity.ivf_topk(
            emb, queries, centroids, k=3, nprobe=2).collect())
    )
    assert got2 == want

    # swapping centroids under a standing index is refused
    with pytest.raises(ValueError, match="already has persisted centroids"):
        AnnIngest(AppendLog(str(tmp_path / "state")), centroids=centroids)


def test_centroid_drift_signal(spark, emb, tmp_path):
    """Centroids equal to each cell's true mean -> drift sim ~ 1.0; an
    arbitrary (first-k-vectors) centroid set scores strictly lower on at
    least one cell — the staleness signal a rebuild schedule reads."""
    from kafka_cdc_redshift_spark.functions.clustering import kmeans

    arbitrary = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    ann = AnnIngest(AppendLog(str(tmp_path / "s1")), centroids=arbitrary)
    ann.process_batch(emb, 0)
    drift = {r.cell: r.mean_sim for r in ann.centroid_drift(spark).collect()}
    assert drift and all(-1.0 <= s <= 1.0 + 1e-9 for s in drift.values())

    # trained centroids (k-means cell means) must sit closer to their
    # cells' means than the arbitrary seed does on average
    assigned = kmeans(emb, k=8, iters=2)
    # build centroid vectors = converged cell means via one agg
    cells = emb.join(assigned.select("vec_id", "cell"), "vec_id")
    dims = cells.select("cell", F.posexplode("embedding").alias("j", "x")) \
        .groupBy("cell", "j").agg(F.avg(F.col("x").cast("double")).alias("m"))
    trained = (
        dims.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("j", "m"))).alias("jm"))
        .select(F.col("cell").alias("cent_id"),
                F.transform("jm", lambda s: s["m"]).alias("c_emb"))
    )
    ann2 = AnnIngest(AppendLog(str(tmp_path / "s2")), centroids=trained)
    ann2.process_batch(emb, 0)
    drift2 = {r.cell: r.mean_sim for r in ann2.centroid_drift(spark).collect()}
    import statistics

    assert statistics.mean(drift2.values()) >= statistics.mean(drift.values())
