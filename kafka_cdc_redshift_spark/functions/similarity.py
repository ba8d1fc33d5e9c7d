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
from ..util import spread


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

    emb = spread(emb)
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


def embedding_near_dup_pairs(
    emb: DataFrame,
    *,
    threshold: float = 0.9,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: sign-bit-bucket candidate
    generation (near-identical vectors share their sign pattern), exact
    cosine verification, pairs with cos >= threshold.

    The bucket equi-join bounds the candidate set to same-bucket pairs —
    the O(N^2) cross join never materializes. At 100 TB the bucket is the
    shuffle key; skewed buckets are handled by AQE skew-join splitting.
    """
    b = spread(emb).select(
        F.col(id_col), F.col(vec_col),
        signbit_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = b.alias("a").join(
        b.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = dot_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        norm_col(F.col(f"a.{vec_col}")) * norm_col(F.col(f"b.{vec_col}"))
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    n_cells: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its `n_cells` nearest centroids by cosine
    (deterministic tiebreak on cent_id). `centroids` must have columns
    (cent_id, c_emb) and is broadcast — the corpus never shuffles for
    assignment; only the window's hash partition moves data."""
    from pyspark.sql import Window

    scored = spread(emb).crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(vec_col), F.col("cent_id"),
        (
            dot_col(F.col(vec_col), F.col("c_emb"))
            / (norm_col(F.col(vec_col)) * norm_col(F.col("c_emb")))
        ).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("cent_id"))
    return (
        scored.withColumn("c_rnk", F.row_number().over(w))
        .filter(F.col("c_rnk") <= n_cells)
        .select(id_col, vec_col, F.col("cent_id").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate nearest neighbors: corpus vectors live in their single
    nearest-centroid cell; each query probes its `nprobe` nearest cells and
    searches only those. The scale path for ANN when sign-bit LSH recall is
    insufficient: cells are data-adaptive (centroids from a training step —
    here supplied by the caller; deterministic in the catalog query).

    Join shape at 1000 executors: corpus partitioned by cell once (reusable
    across query batches), query->cell probe list broadcast, per-cell local
    scan + global top-k window.
    """
    cells = ivf_assign(emb, centroids, n_cells=1, id_col=id_col, vec_col=vec_col)
    return ivf_topk_from_cells(
        cells, queries, centroids, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )


def ivf_topk_from_cells(
    cells: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`ivf_topk` against a PREBUILT cell assignment (columns id, vec,
    cell) — the serving shape: the corpus's (id, vec, cell) relation is
    the persistable IVF index (built once at ingest, see
    streaming/ann_ingest.py), so query batches never re-assign the
    corpus; only the probe list and per-cell scans run."""
    from pyspark.sql import Window

    probes = ivf_assign(
        queries.select(F.col("q_id").alias(id_col), F.col("q_emb").alias(vec_col)),
        centroids, n_cells=nprobe, id_col=id_col, vec_col=vec_col,
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"), "cell"
    )
    pairs = cells.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col("q_id")
    )
    cos = dot_col(F.col(vec_col), F.col("q_emb")) / (
        norm_col(F.col(vec_col)) * norm_col(F.col("q_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.select(
            "q_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos_sim")
        )
        # corpus vectors live in exactly ONE cell (n_cells=1) so a
        # (q, neighbor) pair can't repeat across probes — no dedup needed
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


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

    corpus = spread(emb).withColumn("bucket", signbit_bucket(F.col(vec_col), planes))
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


def l2_normalize(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Unit-normalize the embedding column (the standard pre-step that turns
    cosine into a plain dot product downstream). Map-only native transform;
    zero vectors pass through unchanged (norm guarded)."""
    v = _dbl(F.col(vec_col))
    nrm = norm_col(F.col(vec_col))
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    return spread(emb).select(F.col(id_col), unit.alias("unit_vec"))


def quantize_int8(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = 127/max|v|,
    q_i = floor(v_i * scale + 0.5) — floor instead of round() because
    half-rounding modes differ across engines while floor is exact IEEE,
    so the oracle matches bit-for-bit. The 4x footprint cut is what makes
    a 100 TB ANN corpus fit hot storage; dequantization error is bounded
    by 0.5/scale per coordinate."""
    v = _dbl(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    return spread(emb).select(
        F.col(id_col), scale.alias("scale"), q.alias("q_vec")
    )


def cosine_pair_hist(
    emb: DataFrame,
    *,
    sample_mod: int = 4,
    buckets: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Histogram of pairwise cosine similarity over a deterministic
    id-hash sample — the corpus-geometry diagnostic a dedup/ANN pipeline
    runs before choosing thresholds (is the corpus clumped near cos=1? is
    a 0.9 near-dup cutoff separating anything?).

    Sampling keeps ids with id % sample_mod == 0, so the pair set is
    reproducible and the quadratic cost is bounded at (N/sample_mod)^2/2 —
    at corpus scale pick sample_mod so the sample is ~10^4-10^5 vectors.
    Bucket i covers cos in [-1 + 2i/buckets, -1 + 2(i+1)/buckets); cos=1.0
    exactly is clamped into the top bucket. All arithmetic is the same
    sequential fold the other similarity ops use (bit-identical to the
    DuckDB oracle), and floor() of identical doubles is exact — bucket
    boundaries cannot flake.
    """
    sample = spread(emb).filter(F.col(id_col) % sample_mod == 0).select(
        F.col(id_col).alias("id"), _dbl(F.col(vec_col)).alias("e")
    )
    a, b = sample.alias("a"), sample.alias("b")
    cos = dot_col(F.col("a.e"), F.col("b.e")) / (
        norm_col(F.col("a.e")) * norm_col(F.col("b.e"))
    )
    bucket = F.least(
        F.floor((cos + 1.0) * buckets / 2.0).cast("int"), F.lit(buckets - 1)
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: assign every vector to its
    nearest centroid (broadcast scoring, see ivf_assign), then mark as
    duplicate any vector whose cell contains a LOWER-id vector within
    `threshold` cosine. Emits (id, cell, is_dup).

    Scale design: the pairwise compare never crosses cells — the self-join
    key is the cell id, so shuffle volume is one corpus pass and each
    reduce task handles one cell's pairs (cluster counts are chosen so
    cells stay small; skewed giant cells are exactly what the centroid
    count knob controls). The greedy keep-lowest-id rule needs no
    iteration, unlike connected components: dedup decisions are local to
    a cell.
    """
    # the assignment feeds three consumers (both self-join sides + the
    # final flag join); materialize it once instead of recomputing the
    # broadcast scoring + assignment window per consumer — this is the
    # "cluster then dedup within cluster" barrier SemDeDup itself has
    cells = ivf_assign(
        emb, centroids, n_cells=1, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=False)
    return semantic_dedup_from_cells(
        cells, threshold=threshold, id_col=id_col, vec_col=vec_col
    )


def semantic_dedup_from_cells(
    cells: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The within-cell dedup reduction over an ALREADY-MATERIALIZED
    (id, vec, cell) assignment — the serving path: `semantic_dedup`
    assigns a corpus into it, and the streamed index
    (streaming/ann_ingest.AnnIngest.semantic_dups) serves its standing
    tombstone-resolved cell relation through the same code, so streamed
    semantic dedup == one-shot semantic_dedup over the live corpus
    against the same persisted centroids."""
    a = cells.select(
        F.col("cell"), F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_e")
    )
    b = cells.select(
        F.col("cell"), F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_e")
    )
    cos = dot_col(F.col("a_e"), F.col("b_e")) / (
        norm_col(F.col("a_e")) * norm_col(F.col("b_e"))
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return cells.join(dups, id_col, "left").select(
        id_col,
        F.col("cell").cast("int").alias("cell"),
        F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory axis of ANN at corpus scale
#
# IVF (above) cuts the SCAN cost; PQ cuts the FOOTPRINT: a d-dim float
# vector (256 bytes at d=64) compresses to n_sub small codes (4 bytes at
# n_sub=4) by quantizing each subvector to its nearest codeword in a
# per-subspace codebook. Query scoring is asymmetric distance
# computation (ADC): the query precomputes its distance to every
# codeword ONCE (|codebook| = n_sub * n_codes entries — tiny, broadcast),
# and each corpus vector's estimated distance is n_sub table lookups +
# adds instead of a d-term dot product — d/n_sub less arithmetic per
# candidate and ~64x less state to hold the corpus.
#
# Squared L2 everywhere, expanded as dot(a,a) - 2*dot(a,b) + dot(b,b)
# with the same sequential double fold as the cosine path, so every
# distance (and therefore every argmin code and every ranking) replays
# bit-for-bit in the SQL oracle. Codebooks are caller-supplied
# (deterministic in the catalog query, k-means-trained in production —
# the same split as ivf_topk's centroids).
# ---------------------------------------------------------------------------


def _sq_l2(a: Column, b: Column) -> Column:
    """||a-b||^2 via the expanded form both engines evaluate identically
    (elementwise-subtract folds would not match list_dot_product)."""
    return dot_col(a, a) - F.lit(2.0) * dot_col(a, b) + dot_col(b, b)


def subvector_codebooks(
    rows: DataFrame,
    *,
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Slice codeword source rows into per-subspace codebooks:
    (sub, code, cvec) with code = the source row's id. Production trains
    these with per-subspace k-means (functions/clustering); the catalog
    query feeds fixed corpus rows for a deterministic oracle.

    One scan: the subspace axis is generated (explode of a literal
    range), not a per-subspace union that would re-read the source
    n_sub times."""
    return rows.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
        F.col(id_col).cast("int").alias("code"),
        _dbl(F.col(vec_col)).alias("_v"),
        (F.size(F.col(vec_col)) / n_sub).cast("int").alias("_w"),
    ).select(
        "sub",
        "code",
        F.slice(
            F.col("_v"), F.col("_w") * F.col("sub") + 1, F.col("_w")
        ).alias("cvec"),
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    *,
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize the corpus: (id, codes array<int>, ordered by subspace).
    This IS the serving index artifact — n_sub ints per vector instead
    of d floats. Plan: corpus x broadcast codebooks (|codebooks| =
    n_sub * n_codes rows), then ONE hash aggregation by id whose
    per-subspace `min(struct(dist, code))` columns pick each argmin —
    lexicographic struct-min == the (distance, code) ordering, and
    unlike a window argmin it combines map-side, so the shuffle carries
    |corpus| pre-reduced rows, not the x(n_sub*n_codes) cross product."""
    sub_sl = F.slice(
        _dbl(F.col(vec_col)),
        (F.size(F.col(vec_col)) / n_sub).cast("int") * F.col("sub") + 1,
        (F.size(F.col(vec_col)) / n_sub).cast("int"),
    )
    d = (
        spread(emb)
        .crossJoin(F.broadcast(codebooks))
        .select(
            F.col(id_col),
            "sub",
            "code",
            _sq_l2(sub_sl, F.col("cvec")).alias("dist"),
        )
    )
    aggs = [
        F.min(F.when(F.col("sub") == s, F.struct("dist", "code")))
        .alias(f"_c{s}")
        for s in range(n_sub)
    ]
    return (
        d.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(
                *[F.col(f"_c{s}.code") for s in range(n_sub)]
            ).alias("codes"),
        )
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    n_sub: int | None = None,
) -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: each query's per-codeword
    distance table joins the exploded (id, sub, code) corpus on
    (sub, code) — an O(1) add per corpus subspace — then a per-query
    top-k window on the summed estimate. Output: (q_id, neighbor_id,
    pq_dist, rnk). The distance table is |Q| * n_sub * n_codes rows —
    broadcast; the corpus side never carries vectors, only codes.

    The per-subspace terms fold in SUBSPACE order: a bare F.sum over
    doubles commits to no accumulation order, and float addition is not
    associative — the ordered chain is what lets the oracle's explicit
    ((0+d0)+d1)+... replay the estimate bit-for-bit. With `n_sub` given
    (the fast path) the fold is n_sub combinable min-pivots plus a
    codegen'd add chain — map-side partial aggregation, no interpreted
    higher-order functions; without it, a generic collect_list +
    array_sort + sequential aggregate computes the same chain."""
    from pyspark.sql import Window

    qsub = queries.crossJoin(F.broadcast(codebooks)).select(
        "q_id",
        "sub",
        "code",
        _sq_l2(
            F.slice(
                _dbl(F.col("q_emb")),
                F.col("sub") * F.size("cvec") + 1,
                F.size("cvec"),
            ),
            F.col("cvec"),
        ).alias("dist"),
    )
    ex = codes_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub", "code"),
    )
    grouped = ex.join(F.broadcast(qsub), ["sub", "code"]).groupBy(
        "q_id", "neighbor_id"
    )
    if n_sub is not None:
        # exactly one joined row per (q, neighbor, sub) -> min == the value
        est = grouped.agg(
            *[
                F.min(F.when(F.col("sub") == s, F.col("dist"))).alias(f"_d{s}")
                for s in range(n_sub)
            ]
        )
        acc = F.lit(0.0)
        for s in range(n_sub):
            acc = acc + F.col(f"_d{s}")
        est = est.select("q_id", "neighbor_id", acc.alias("pq_dist"))
    else:
        est = grouped.agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "dist"))),
                    lambda e: e["dist"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("pq_dist")
        )
    w = Window.partitionBy("q_id").orderBy("pq_dist", "neighbor_id")
    return (
        est.filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def pq_shortlist_rerank(
    codes_df: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    *,
    k: int = 3,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int | None = None,
) -> DataFrame:
    """The production PQ serving shape: ADC over the code index prunes
    the corpus to a `shortlist` per query, then EXACT squared-L2 re-ranks
    only the shortlist with full-precision vectors. Output: (q_id,
    neighbor_id, l2_dist, rnk).

    Why this split: quantization error makes raw ADC ranks unreliable at
    the top (worst case — isotropic random vectors — measured ~20%
    recall@3 on the test corpus), but a C-deep shortlist is robust
    (~83% capture at C = 20% of corpus on the same worst case; real
    clustered embeddings do far better). The exact pass touches full
    vectors for only C * |Q| rows — an id-join-pruned scan — while the
    corpus-wide pass reads codes alone (d*4/n_sub-fold smaller than the
    float vectors, e.g. 32x at d=64, n_sub=8)."""
    from pyspark.sql import Window

    short = pq_topk(
        codes_df, queries, codebooks, k=shortlist, id_col=id_col,
        n_sub=n_sub,
    ).select("q_id", "neighbor_id")
    full = short.join(
        emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_emb")
        ),
        "neighbor_id",
    ).join(F.broadcast(queries), "q_id")
    l2 = _sq_l2(_dbl(F.col("n_emb")), _dbl(F.col("q_emb")))
    w = Window.partitionBy("q_id").orderBy("l2_dist", "neighbor_id")
    return (
        full.select("q_id", "neighbor_id", l2.alias("l2_dist"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
