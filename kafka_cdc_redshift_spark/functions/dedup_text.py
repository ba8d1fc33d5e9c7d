"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (100 TB of documents):
  * exact_dedup — one hash-shuffle on md5(text); map-side partial agg.
  * jaccard_pairs — shingle-explode + self-join on shingle. The join key is
    the shingle, so co-occurring docs meet without a cross join. At scale,
    pass `max_df` to drop stop-shingles (a shingle present in thousands of
    docs generates a quadratic pair blowup and carries no near-dup signal).
  * minhash_lsh_pairs — the scale path: constant-size signature per doc
    (num_hashes ints), band join generates candidates, exact Jaccard
    verifies. Shuffle volume drops from O(shingles) to O(num_hashes) per
    doc, and only candidate pairs (not all pair-sharing-a-shingle) are
    verified.
  * simhash — one 64->16-bit sketch per doc in a single agg pass; duplicate
    clusters = equal sketches (or hamming<=k via banded equality).

Everything is deterministic and engine-portable (hash60 = md5-prefix), so
the DuckDB oracles replay the identical algorithm, not just the result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import spread
from .text import hash60, tokens_col


def shingles_col(text: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of trim(lower(text))."""
    toks = tokens_col(text)
    # total function: sequence(1, 0) would run DESCENDING and feed slice a 0
    # start — guard inside the expression (a row filter upstream is not a
    # reliable guard once Catalyst folds local relations)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exact_dedup(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min id."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_doc_id"))
    )


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return spread(df).filter(F.size(tokens_col(text_col)) >= n).select(
        F.col(id_col).alias("doc_id"), shingles_col(text_col, n).alias("sh_set")
    )


# stop-shingle document-frequency cut, ON by default: a shingle present in
# d documents emits O(d^2) join rows — one common 3-gram with df=10^4 is
# 10^8 pairs before any pruning can act, which is the operator's only
# quadratic escape hatch at corpus scale. df > max_df shingles carry no
# near-dup signal (they are corpus-common phrases), so cutting them bounds
# the blowup at O(max_df^2) per shingle. Pass max_df=None for the exact
# all-shingles variant (small/verification workloads only).
DEFAULT_MAX_DF = 1000


def jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_DF,
    cut_strategy: str = "window",
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold.

    Exact when max_df is None: any pair with Jaccard > 0 shares >= 1
    shingle, so the shingle-keyed self-join loses nothing. With the
    (default) stop-shingle cut, the intersection is counted over surviving
    shingles while set sizes stay pre-cut, so the reported jaccard is a
    conservative lower bound — a pair can only be dropped if its overlap
    rides on corpus-hot shingles.

    cut_strategy picks how df counts are computed:
      * "window" (default): count() over Window.partitionBy(sh) — the df
        annotation rides the SAME hash-partitioning the sort-merge self-join
        needs, so the whole pipeline pays ONE shuffle of the posting list
        (measured 3x faster than the exact no-cut join at sf0.1). A
        corpus-hot shingle concentrates its rows in one counting task
        before being dropped; that pass is linear and spill-safe — the
        quadratic pair blowup the cut exists to prevent never happens.
      * "prefilter": aggregate dfs (map-side combinable, no skewed task)
        and broadcast-anti-join the hot set BEFORE the join shuffle. Costs
        a second pass over the shingle explode; use when single hot
        shingles are so extreme (df in the 10^8 range) that even one
        linear pass through one task is unacceptable.
    """
    return jaccard_pairs_from_sets(
        _shingle_sets(df, id_col, text_col, n),
        threshold=threshold, max_df=max_df, cut_strategy=cut_strategy,
    )


def jaccard_pairs_from_sets(
    sets_: DataFrame,
    *,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_DF,
    cut_strategy: str = "window",
) -> DataFrame:
    """The exact-Jaccard pair reduction over ALREADY-BUILT (doc_id,
    sh_set) shingle sets — the sharing path: when a job runs BOTH the
    exact pipeline and an LSH pipeline over the same corpus (e.g. the
    dedup_minhash_eval recall audit), build the shingle relation once
    (`shingle_sketches`), localCheckpoint it, and feed it to both — the
    tokenize+shingle pass over the corpus then runs once instead of once
    per pipeline. Semantics identical to `jaccard_pairs`."""
    # carry the set size on every exploded row: the pair join can then
    # (a) prune by the size-ratio bound j <= min(sz)/max(sz) BEFORE the
    # aggregation, and (b) compute jaccard without re-joining sizes.
    # explode_outer: the non-outer Generate gets an inferred `size(sh_set)>0`
    # filter whose pushdown substitutes the WHOLE shingle expression below the
    # spread() repartition — recomputing it single-task. Sets are provably
    # non-empty here (token filter upstream), so outer is semantically equal.
    ex = sets_.select(
        "doc_id", F.size("sh_set").alias("sz"), F.explode_outer("sh_set").alias("sh")
    )
    if max_df is not None:
        if cut_strategy == "window":
            from pyspark.sql import Window

            ex = (
                ex.withColumn(
                    "__df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
                )
                .filter(F.col("__df") <= max_df)
                .drop("__df")
            )
        elif cut_strategy == "prefilter":
            hot = (
                ex.groupBy("sh").count().filter(F.col("count") > max_df).select("sh")
            )
            ex = ex.join(F.broadcast(hot), "sh", "left_anti")
        else:
            raise ValueError(f"unknown cut_strategy: {cut_strategy!r}")
    t = F.lit(float(threshold))
    # sort-merge, not broadcast: the exploded posting list is NOT a dim table
    # — broadcasting it is unstable here and impossible at corpus scale; SMJ
    # shuffles both sides by shingle once and streams matches
    pairs = (
        ex.alias("a")
        .join(
            ex.hint("merge").alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio pruning: if min/max < t the pair can't reach t
            & (F.col("b.sz").cast("double") >= t * F.col("a.sz"))
            & (F.col("a.sz").cast("double") >= t * F.col("b.sz")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """All pairs whose shingle-set CONTAINMENT max(|A∩B|/|A|, |A∩B|/|B|)
    >= threshold — the asymmetric near-dup relation Jaccard misses: a
    short document quoted or embedded verbatim inside a long one has
    tiny Jaccard (the union is dominated by the long doc) but containment
    ~1 on the short side. Emits (doc_a, doc_b, containment_a,
    containment_b, jaccard) with doc_a < doc_b; containment_a = the
    fraction of doc_a's shingles found in doc_b.

    Same posting-list shape as `jaccard_pairs` (one shingle-keyed SMJ
    shuffle, the stop-shingle cut bounding hot buckets) EXCEPT the
    size-ratio prune: size asymmetry is exactly the signal here, so no
    pair is pruned by size. At corpus scale that makes the hot-shingle
    cut (`max_df`) load-bearing, not optional — a boilerplate shingle
    joins every tiny quote to every big page."""
    return containment_pairs_from_sets(
        _shingle_sets(df, id_col, text_col, n),
        threshold=threshold, max_df=max_df,
    )


def containment_pairs_from_sets(
    sets_: DataFrame,
    *,
    threshold: float = 0.8,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """The containment reduction over ALREADY-MATERIALIZED (doc_id,
    sh_set) shingle sets — the serving path: `containment_pairs`
    shingles a corpus into it, and the streamed dedup state
    (streaming/dedup_ingest.DedupIngest.containment) serves its
    standing verification sketches through the same code, so streamed
    containment == one-shot containment_pairs over the live corpus."""
    ex = sets_.select(
        "doc_id", F.size("sh_set").alias("sz"), F.explode_outer("sh_set").alias("sh")
    )
    if max_df is not None:
        from pyspark.sql import Window

        ex = (
            ex.withColumn(
                "__df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
            )
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    pairs = (
        ex.alias("a")
        .join(
            ex.hint("merge").alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    inter_d = F.col("inter").cast("double")
    c_a = inter_d / F.col("sz_a").cast("double")
    c_b = inter_d / F.col("sz_b").cast("double")
    jac = inter_d / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return (
        pairs.select(
            "doc_a", "doc_b",
            c_a.alias("containment_a"), c_b.alias("containment_b"),
            jac.alias("jaccard"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= F.lit(float(threshold))
        )
    )


# universal-hash family over a 2^30 universe (int64-overflow-safe in both
# engines, Spark ANSI mode included): h_s = (a_s * h30 + b_s) mod P
_MH_P = 4294967291          # largest prime < 2^32
_MH_H30 = 1 << 30


def _mh_params(seed: int) -> tuple[int, int]:
    a = (2654435761 * (seed + 1)) % _MH_P
    b = (40503 * (seed + 7) + 1) % _MH_P
    return a, b


def minhash_signatures(sets_: DataFrame, num_hashes: int) -> DataFrame:
    """Wide signature row per doc: (doc_id, mh0..mh{k-1}).

    One md5 per shingle (hash60), then k cheap integer universal hashes —
    no per-seed row explosion, ONE groupBy with k min() aggregates. Shuffle
    volume is O(docs * k ints) instead of O(shingles * k rows).
    """
    # explode_outer: see jaccard_pairs — keeps the inferred-filter pushdown
    # from duplicating the shingle computation below the repartition
    ex = sets_.select("doc_id", F.explode_outer("sh_set").alias("sh"))
    h30 = (hash60("sh") % _MH_H30).alias("h30")
    ex = ex.select("doc_id", h30)
    aggs = []
    for s in range(num_hashes):
        a, b = _mh_params(s)
        aggs.append(
            F.min((F.lit(a) * F.col("h30") + F.lit(b)) % _MH_P).alias(f"mh{s}")
        )
    return ex.groupBy("doc_id").agg(*aggs)


def shingle_sketches(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, sh_set) verification sketches — persist alongside the band
    index (`lsh_band_index`) so future ingest batches can exact-verify
    candidates without the original corpus text (see
    `minhash_lsh_incremental(sketches=...)`). Size is the distinct
    n-gram set per doc; at corpus scale store it bucketed by doc_id."""
    return _shingle_sets(df, id_col, text_col, n)


def lsh_band_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded-signature index of a corpus: one (doc_id, band, bkey) row per
    band — the persistable artifact of MinHash-LSH. Build it ONCE for the
    standing corpus (and store it partitioned/bucketed by (band, bkey));
    every new ingest batch then dedups against the corpus by joining its
    own (tiny) band relation to this index — see
    `minhash_lsh_incremental`. Size is exactly docs x n_bands rows of
    (id, int, short string), independent of document length."""
    return lsh_band_index_from_sets(
        _shingle_sets(df, id_col, text_col, n),
        num_hashes=num_hashes, band_size=band_size, max_bucket=max_bucket,
    )


def lsh_band_index_from_sets(
    sets_: DataFrame,
    *,
    num_hashes: int = 12,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """`lsh_band_index` over ALREADY-BUILT (doc_id, sh_set) shingle sets
    — the sharing path (see `jaccard_pairs_from_sets`)."""
    sig = minhash_signatures(sets_, num_hashes)
    n_bands = num_hashes // band_size
    band_rows = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{bi * band_size + r}").cast("string")
                    for r in range(band_size)
                ],
            ).alias("bkey"),
        )
        for bi in range(n_bands)
    ]
    out = sig.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bkey")
    # build-time hot-bucket cap (see _cap_hot_buckets): a STORED index
    # should be built with this so no ingest ever meets a quadratic bucket
    if max_bucket is not None:
        out = _cap_hot_buckets(out, max_bucket)
    return out


def _cap_hot_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Drop (band, bkey) buckets holding more than `max_bucket` docs before
    the candidate self-join. A hot bucket (boilerplate, near-empty docs,
    adversarial repeats) generates O(bucket²) candidate pairs — at corpus
    scale one million-doc bucket is a trillion-pair reducer. The cap is
    the LSH analog of jaccard_pairs' stop-shingle cut: docs sharing a
    dropped bucket usually co-occur in other, rarer buckets, so recall
    loss concentrates on pathological clusters (which exact-dedup or a
    dedicated boilerplate pass should own anyway).

    The bucket count is a window over the join's OWN key, so after the
    one hash exchange on (band, bkey) the count, the filter, and the
    self-join all run co-partitioned — no extra shuffle."""
    w = Window.partitionBy("band", "bkey")
    return (
        bands.withColumn("__bn", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verification.

    Candidates: pairs agreeing on ALL rows of >= 1 band (classic banding,
    P(candidate) = 1-(1-j^r)^b). Each candidate is then verified with exact
    shingle Jaccard, so the output has no false positives — only bounded
    false-negative probability, which is the documented LSH trade-off.
    `max_bucket` (optional) caps candidate-bucket size for hot-key safety
    at corpus scale — see `_cap_hot_buckets`; None preserves exact
    recall-parity with the SQL oracle.
    """
    bands = lsh_band_index(
        df, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, band_size=band_size, max_bucket=max_bucket,
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # materialize: LSH shrinks the corpus to a small candidate set, and
        # both the id-restriction below and the final pair join consume it —
        # without this the band join would run once per consumer
        .localCheckpoint()
    )
    # verify ONLY candidate docs: recompute shingle sets for the (small)
    # id set that survived banding instead of the whole corpus — at corpus
    # scale the full shingle relation exists once for signatures and never
    # again; the semi-joined rebuild touches a tiny fraction of documents
    cand_ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    cand_sets = _shingle_sets(
        df.join(F.broadcast(cand_ids), id_col, "semi"), id_col, text_col, n
    )
    seta = cand_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    setb = cand_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = inter.cast("double") / (
        F.size("set_a") + F.size("set_b") - inter
    ).cast("double")
    return (
        cand.join(seta, "doc_a")
        .join(setb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs_from_sets(
    sets_: DataFrame,
    *,
    num_hashes: int = 12,
    band_size: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """`minhash_lsh_pairs` over ALREADY-BUILT (doc_id, sh_set) shingle
    sets — the sharing path (see `jaccard_pairs_from_sets`): signatures
    derive from `sets_`, and exact-Jaccard verification semi-joins the
    SAME relation on the candidate ids instead of re-shingling the
    corpus text. Pass a localCheckpoint'ed `sets_` when another pipeline
    consumes it too; results are identical to `minhash_lsh_pairs` (the
    candidate ids are a subset of sets_'s doc ids by construction)."""
    bands = lsh_band_index_from_sets(
        sets_, num_hashes=num_hashes, band_size=band_size,
        max_bucket=max_bucket,
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # materialize: the id restriction below and the final pair join
        # both consume it (see minhash_lsh_pairs)
        .localCheckpoint()
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_sets = sets_.join(F.broadcast(cand_ids), "doc_id", "semi")
    seta = cand_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a")
    )
    setb = cand_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = inter.cast("double") / (
        F.size("set_a") + F.size("set_b") - inter
    ).cast("double")
    return (
        cand.join(seta, "doc_a")
        .join(setb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    corpus: DataFrame | None = None,
    *,
    index: DataFrame | None = None,
    sketches: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs (doc_new, doc_old, jaccard) between a NEW ingest
    batch and the EXISTING corpus — the crawl-ingest shape: the standing
    corpus is never re-signed, only joined through its prebuilt
    `lsh_band_index` (pass `index=` to reuse a stored one; built here
    from `corpus` otherwise).

    Per-ingest cost is proportional to the batch (its shingles + bands)
    plus the matched candidates: the candidate join hits the index on
    (band, bkey) — with the index stored bucketed on those keys, only
    the batch's bands move — and exact-Jaccard verification rebuilds
    shingle sets ONLY for docs that appear in a candidate pair (semi-
    joined on both sides), so a 100 TB corpus contributes a few rows per
    match, not a scan. Output has no false positives (every candidate is
    exact-verified); false-negative probability is the banding bound
    1-(1-j^r)^b, identical to `minhash_lsh_pairs`.

    Within-batch duplicates are NOT reported — run `minhash_lsh_pairs`
    on the batch for that (cheap: the batch is small); this operator's
    contract is strictly batch-vs-corpus.

    The corpus side can be given three ways: raw docs (`corpus` — index
    and verification sets built here), a stored `index` (bands reused,
    verification rebuilt from `corpus`), or fully doc-free: `index` +
    `sketches` ((doc_id, sh_set) rows, e.g. `shingle_sketches` persisted
    at ingest) — then the original corpus TEXT is never needed at all,
    which is the streaming-ingest shape (streaming/dedup_ingest.py).
    """
    if corpus is None and (index is None or sketches is None):
        raise ValueError(
            "minhash_lsh_incremental needs either `corpus` docs or both "
            "`index` and `sketches`"
        )
    if index is None:
        index = lsh_band_index(
            corpus, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, band_size=band_size,
            max_bucket=max_bucket,
        )
    new_bands = lsh_band_index(
        new_docs, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, band_size=band_size, max_bucket=max_bucket,
    )
    cand = (
        new_bands.alias("a")
        .join(index.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_new"),
            F.col("b.doc_id").alias("doc_old"),
        )
        .distinct()
        # two consumers below (each side's id restriction) + the final
        # pair join — materialize the small candidate set once
        .localCheckpoint()
    )
    new_ids = cand.select(F.col("doc_new").alias(id_col)).distinct()
    old_ids = cand.select(F.col("doc_old").alias(id_col)).distinct()
    new_sets = _shingle_sets(
        new_docs.join(F.broadcast(new_ids), id_col, "semi"), id_col, text_col, n
    ).select(F.col("doc_id").alias("doc_new"), F.col("sh_set").alias("set_n"))
    if sketches is not None:
        old_sets = sketches.join(F.broadcast(old_ids), id_col, "semi").select(
            F.col("doc_id").alias("doc_old"), F.col("sh_set").alias("set_o")
        )
    else:
        old_sets = _shingle_sets(
            corpus.join(F.broadcast(old_ids), id_col, "semi"), id_col, text_col, n
        ).select(F.col("doc_id").alias("doc_old"), F.col("sh_set").alias("set_o"))
    inter = F.size(F.array_intersect("set_n", "set_o"))
    jac = inter.cast("double") / (
        F.size("set_n") + F.size("set_o") - inter
    ).cast("double")
    return (
        cand.join(new_sets, "doc_new")
        .join(old_sets, "doc_old")
        .select("doc_new", "doc_old", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Frequency-weighted SimHash sketch over token hash60s (low `bits`)."""
    # explode_outer + post-filter on the generated column: a plain explode
    # would get an inferred size(tokens)>0 filter with the whole tokenize
    # expression substituted in (evaluated twice per row) — NOTES.md #2
    tok = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(tokens_col(text_col)).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .withColumn("h", hash60("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sketch = reduce(
        lambda acc, b: acc + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0),
        range(1, bits),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(0),
    )
    return agg.select("doc_id", sketch.cast("long").alias("simhash"))


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (doc_id, cluster_id)
    with cluster_id = the minimum doc_id in the component; documents in no
    pair are singleton clusters of themselves. This is the step that turns
    pairwise near-dup evidence into keep/drop decisions (keep cluster_id,
    drop the rest).

    Iterative min-label propagation with POINTER JUMPING over ONLY the
    vertices that appear in a pair — at corpus scale near-dups are a small
    fraction of documents, so the loop's joins run on a tiny relation; the
    (huge) singleton majority joins in exactly once at the end. Each round
    fuses (a) the min-over-neighbors step with (b) a label-of-label hop
    (label := label[label]), which squares propagation distance per round:
    convergence in O(log diameter) barriers instead of O(diameter). The
    convergence probe rides the same materialization as the label update (a
    `chg` flag column) and runs from round 1 on (only the always-true
    round-0 probe is skipped): near-dup graphs are overwhelmingly tiny
    components that one pointer-jump round collapses, and the probe reads
    the round's already-materialized checkpoint — a trivial limit-1 count.
    Lineage is truncated with localCheckpoint so the
    plan stays flat (the legitimate pattern for iterative algorithms — data
    never leaves the cluster).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        # materialize once: every propagation round reads the edge set, and
        # its lineage (e.g. a full jaccard_pairs computation) must not be
        # re-evaluated per round
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for rnd in range(max_iter):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        half = labels.join(nbr, labels.id == nbr.dst, "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            F.coalesce(F.col("nbr_min") < F.col("label"), F.lit(False)).alias("chg"),
        )
        # pointer jump: label := label[label]. min-labels only ever shrink,
        # so following the current label's own label is always valid and
        # doubles the hop distance covered per barrier.
        jump = labels.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        stepped = (
            half.join(jump, half.label == jump.jid, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("jlabel", "label")).alias("label"),
                (
                    F.col("chg")
                    | F.coalesce(F.col("jlabel") < F.col("label"), F.lit(False))
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("id", "label")
        # probe from round 1: near-dup graphs are overwhelmingly tiny
        # components (pairs/triangles) that pointer jumping collapses in
        # one round, so the round-2 probe start ran one full (2-join +
        # checkpoint) round past convergence on the common shape; the
        # probe itself reads the round's ALREADY-materialized checkpoint
        # (limit-1 count), so probing earlier costs one trivial job while
        # deep chains still skip the always-true round-0 probe.
        if rnd >= 1 and stepped.filter("chg").limit(1).count() == 0:
            break
    # singletons (no pair) keep their own id; broadcast the tiny label map
    return df.select(F.col(id_col).alias("doc_id")).distinct().join(
        F.broadcast(labels), F.col("doc_id") == labels.id, "left"
    ).select("doc_id", F.coalesce("label", "doc_id").alias("cluster_id"))
