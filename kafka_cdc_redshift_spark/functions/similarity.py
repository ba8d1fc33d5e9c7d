"""Similarity search over an embedding column (array<float>).

  * cosine_topk — brute-force exact top-k: query set broadcast against the
    corpus, JVM-side fold (zip_with + aggregate) for the dot product, window
    top-k per query. The baseline; O(|Q| * N * d) with no Python in the loop.
  * signbit_lsh_topk — the scale path: random-hyperplane-style LSH where the
    hyperplanes are the first `planes` coordinate axes (sign bits). Bucket
    equi-join replaces the cross join; at 1000 executors the bucket key
    becomes the shuffle key and each bucket is searched locally.

All arithmetic in double precision with a sequential fold — bit-identical to
DuckDB's list_dot_product (verified), so oracles compare at full precision.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` must have columns (q_id, q_emb). The query side is broadcast —
    at scale |Q| << N and the corpus never shuffles.
    """
    from pyspark.sql import Window

    pairs = emb.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col("q_id"))
    cos = dot_col(F.col(vec_col), F.col("q_emb")) / (
        norm_col(F.col(vec_col)) * norm_col(F.col("q_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.select(
            F.col("q_id"),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def signbit_bucket(vec_col: Column, planes: int = 8) -> Column:
    """LSH bucket id from the sign bits of the first `planes` coordinates."""
    return reduce(
        lambda acc, i: acc
        + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(0),
        range(1, planes),
        F.when(F.element_at(vec_col, 1) > 0, F.lit(1)).otherwise(0),
    ).cast("int")


def signbit_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The corpus-side bucket is computed once (a map-only pass); the join is a
    bucket equi-join instead of a cross join — the 100 TB-scale shape.
    """
    from pyspark.sql import Window

    corpus = emb.withColumn("bucket", signbit_bucket(F.col(vec_col), planes))
    qb = queries.withColumn("bucket", signbit_bucket(F.col("q_emb"), planes))
    pairs = corpus.join(F.broadcast(qb), "bucket").filter(
        F.col(id_col) != F.col("q_id")
    )
    cos = dot_col(F.col(vec_col), F.col("q_emb")) / (
        norm_col(F.col(vec_col)) * norm_col(F.col("q_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.select(
            F.col("q_id"),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
