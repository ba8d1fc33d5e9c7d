"""BM25 full-text retrieval over a document corpus.

The retrieval primitive an LLM-data pipeline needs next to ANN: sparse
lexical top-k (RAG candidate generation, eval-set leakage probes beyond
exact n-gram containment, hard-negative mining against an embedding
index). No reference-counterpart module — this extends the engine's
similarity-search family (functions/similarity) to the lexical side.

Shape at scale (census + pruned-join BM25):
  * one explode -> groupBy (doc, term) shuffle for term frequencies
    (map-side partial aggs), carrying the map-side-computed doc length;
  * the query-term relation is tiny (|Q| * terms-per-query) and
    broadcast: the postings prune to matching terms by a broadcast hash
    join BEFORE anything aggregates or shuffles downstream;
  * document frequencies are a map-side-combined groupBy count over the
    PRUNED postings, broadcast back (identical values — df per term is
    unchanged by dropping other terms): an inner join on the grouping
    key does not push below an aggregation, so a full-vocab census then
    a prune would scan-and-shuffle every term per query batch. The
    pruned postings are localCheckpoint'ed so the census lineage
    computes ONCE for both the df aggregation and the scorer — NOT a
    window count over them, which would hash-exchange every matching
    posting by term with no partial aggregation: rows per term =
    df(term) is corpus-bounded, so one stop-word query term would
    serialize millions of postings into a single window partition
    (guide §2.5 skew);
  * corpus constants (n_docs, sum_dl) reduce to one broadcast row
    computed straight from the docs scan (corpus_stats_docs — no
    explode, no shuffle) — precomputed incrementally by the streamed
    index (streaming/retrieval_ingest) so serving never scans postings
    for them;
  * per-(query, doc) scores fold in TERM order: float addition is not
    associative, and the lexicographic chain is what a SQL oracle can
    replay term-by-term (pivot columns + an explicit add chain — the
    pq_topk contract). Terms-per-query is small, so the fold runs over
    a handful of elements.

Determinism contract: `idf_mode="raw"` uses the un-logged Robertson idf
(N - df + 0.5)/(df + 0.5) — products/quotients of exact integer counts
are IEEE-deterministic across engines, while ln() is libm-dependent and
would flake a bit-exact oracle (the tfidf_top_terms convention).
`idf_mode="lucene"` is the standard ln(1 + raw) variant for production
ranking; its per-term idf is a monotone transform of raw, so single-term
rankings are identical and multi-term rankings differ only through the
usual BM25 weighting debates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import spread
from .text import tokens_col


def term_freqs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The (doc_id, dl, term, tf) relation — BM25's entire index state.
    One corpus shuffle keyed (doc, term), doc length computed map-side
    before the explode. This is the postings shape: stored partitioned
    (or streamed/appended) by term it IS an inverted index."""
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("dl"),
        F.explode_outer(tokens_col(text_col)).alias("term"),
    ).filter(F.col("term").isNotNull())
    return base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def positional_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The positional-index superset of `term_freqs`: (doc_id, dl, term,
    tf, positions) where `positions` is the SORTED array of 0-based
    token offsets of `term` in the document (so tf == size(positions)).
    Same single (doc, term)-keyed shuffle as term_freqs — the positions
    ride the existing groupBy as one more aggregate — and the same row
    cardinality: this is the Lucene-style posting-list-with-positions
    layout, which is why a streamed index can serve BM25 AND phrase
    queries from ONE standing table (streaming/retrieval_ingest with
    positions=True). array_sort canonicalizes collect_list's
    partition-order nondeterminism."""
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("dl"),
        F.posexplode_outer(tokens_col(text_col)).alias("pos", "term"),
    ).filter(F.col("term").isNotNull())
    return base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )


def corpus_stats(tf: DataFrame) -> DataFrame:
    """The 1-row (n_docs, sum_dl) corpus constants BM25 normalizes by,
    derived from a (doc_id, dl, term, tf) relation. The streamed index
    instead folds these from mergeable per-batch integer deltas
    (streaming/retrieval_ingest) so serving never scans the postings."""
    return (
        tf.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
    )


def corpus_stats_docs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`corpus_stats(term_freqs(docs))` without the postings census: the
    same 1-row (n_docs, sum_dl), computed from one corpus scan with NO
    explode and NO (doc, term) shuffle — dl is map-side `size(tokens)`,
    exactly the value term_freqs carries, and a doc appears in the
    postings iff it has at least one token (split of a non-null string
    is never empty, so that is `dl >= 1`, which also drops null-text
    docs whose token array — and hence dl — is null). Exact integer
    counts either way, so the two spellings are value-identical; this
    one scans the corpus once instead of tokenizing it a second time."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_col(text_col)).alias("dl"),
        )
        .filter(F.col("dl") >= 1)
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    idf_mode: str = "raw",
) -> DataFrame:
    """Top-k documents per query by BM25. Output: (q_id, doc_id,
    n_terms, score, rnk) — n_terms = how many distinct query terms the
    document matched; ties break on doc_id.

    `queries` is a small relation (q_id, q_text); its distinct terms are
    broadcast against the corpus tf census, so only matching (doc, term)
    rows ever reach the scorer. See the module docstring for the plan
    shape and the idf_mode determinism contract.
    """
    tf = term_freqs(docs, id_col=id_col, text_col=text_col)
    # 1-row corpus constants straight from the docs scan — NOT
    # corpus_stats(tf), which would re-run the whole postings census
    # (explode + (doc, term) shuffle) a second time just to count docs
    # and sum lengths (guide §2.2: shuffle less — the values are
    # identical exact integers either way)
    stats = corpus_stats_docs(docs, id_col=id_col, text_col=text_col)
    return bm25_topk_from_stats(
        tf, stats, queries, k=k, k1=k1, b=b,
        q_id_col=q_id_col, q_text_col=q_text_col, idf_mode=idf_mode,
    )


def bm25_topk_from_stats(
    tf: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    idf_mode: str = "raw",
) -> DataFrame:
    """Score a query batch against a postings relation plus the 1-row
    corpus stats — the serving path: `bm25_topk` delegates here, and the
    streamed index (streaming/retrieval_ingest) serves its standing tf
    through the same code. Document frequencies are a partial-aggregated
    groupBy count over the QUERY-TERM-PRUNED postings, never the full
    vocabulary: an inner join on the grouping key does not push below an
    aggregation, so a full-vocab census then a prune would scan-and-
    shuffle every term per query batch. The pruned postings are
    localCheckpoint'ed (lazy) so their lineage — the whole postings
    census when called via bm25_topk — computes ONCE for both the df
    aggregation and the scorer; the df relation itself is query-term-
    bounded and broadcast back. A window count over the pruned postings
    would avoid the checkpoint but hash-exchanges df(term) rows per term
    into one partition with no map-side combine — corpus-bounded skew
    on stop-word query terms (guide §2.5)."""
    if idf_mode not in ("raw", "lucene"):
        raise ValueError(f"unknown idf_mode {idf_mode!r}")
    from pyspark.sql import Window

    qterms = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(F.array_distinct(tokens_col(q_text_col))).alias("term"),
    )
    # materialize the pruned postings once (lazy: the first action —
    # the qdf broadcast build — runs the census into executor-local
    # storage; the scorer then re-reads rows, not lineage). Pruned rows
    # are what the scorer must touch anyway; without the barrier the df
    # aggregation would carry the entire postings census (corpus explode
    # + (doc, term) shuffle) a second time as a broadcast subtree
    # (guide §2.2).
    # explicit projection (guide §2.3): the standing positional index
    # serves through here with a positions-array column the scorer never
    # reads — it must not be materialized into the checkpoint
    tfq = (
        tf.select("doc_id", "dl", "term", "tf")
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .localCheckpoint(eager=False)
    )
    # per-term document frequency: map-side partial aggregation (skew-
    # resistant — a hot term combines within each map task before the
    # tiny query-term-bounded result shuffles), broadcast back onto the
    # checkpointed postings.
    qdf = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tf = tfq.join(F.broadcast(qdf), "term")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    raw_idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    idf = F.log(F.lit(1.0) + raw_idf) if idf_mode == "lucene" else raw_idf
    sat = (F.lit(k1 + 1.0) * tf_d) / (
        tf_d + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * dl_d) / avgdl)
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select("q_id", "doc_id", "term", (idf * sat).alias("s"))
    )
    agg = scored.groupBy("q_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                lambda e: e["s"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "doc_id", "n_terms", "score", "rnk")
    )


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Exact phrase search via the classic positional-index reduction:
    a phrase of n terms occurs at token position s iff ALL n (term,
    offset) pairs match at s + offset — so join the corpus's positional
    postings to the broadcast phrase terms, normalize each hit to its
    implied start (pos - offset), and a start with n matched offsets is
    an occurrence. Output: (phrase_id, doc_id, n_occurrences), docs with
    at least one occurrence.

    Shape at scale: postings explode map-side; the phrase-term relation
    is tiny and broadcast, pruning the corpus to matching terms BEFORE
    any shuffle (the bm25_topk discipline); the only corpus-wide shuffle
    is the groupBy on (doc, phrase, start) over pruned hits. Per
    (start, offset) at most one posting can match — a position holds one
    token — so count(*) == n_terms is exact even for phrases with
    repeated terms ("the the")."""
    postings = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokens_col(text_col)).alias("pos", "term"),
    ).filter(F.col("term").isNotNull())
    return phrase_match_from_postings(
        postings, phrases,
        phrase_id_col=phrase_id_col, phrase_col=phrase_col,
    )


def phrase_match_from_postings(
    postings: DataFrame,
    phrases: DataFrame,
    *,
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """The positional-index reduction over an ALREADY-MATERIALIZED flat
    (doc_id, pos, term) relation — the serving path: `phrase_match`
    explodes a corpus into it, and the streamed index
    (streaming/retrieval_ingest, positions=True) serves its standing
    posting lists through the same code, so streamed phrase results ==
    one-shot phrase_match over the final corpus by construction."""
    pterms = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.size(tokens_col(phrase_col)).alias("n_terms"),
        F.posexplode(tokens_col(phrase_col)).alias("offset", "term"),
    )
    hits = postings.join(F.broadcast(pterms), "term").select(
        "doc_id", "phrase_id", "n_terms",
        (F.col("pos") - F.col("offset")).alias("start"),
    )
    starts = (
        hits.groupBy("doc_id", "phrase_id", "start")
        .agg(F.count(F.lit(1)).alias("n_hit"), F.min("n_terms").alias("n_terms"))
        .filter(F.col("n_hit") == F.col("n_terms"))
    )
    return starts.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def ranking_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Ranking-quality evaluation — the retrieval family's closing
    loop: given a top-k `ranking` (q_id, doc_id, rnk) and a `qrels`
    relevance set (q_id, doc_id), emit per-query
    (q_id, n_rel, n_hits, recall_at_k, mrr):

      * recall_at_k = |top-k ∩ relevant| / |relevant|,
      * mrr = 1 / rank of the first relevant result (0.0 if none in
        the top k) — the reciprocal-rank term RRF itself is built on.

    Every metric is a ratio of exact integers (one IEEE division —
    cross-engine deterministic; no log-based NDCG here precisely
    because libm log2 is not bit-portable, the tfidf/bm25 raw-idf
    convention). Queries with relevance judgments but no retrieved
    hits still get a row (right-anchored on qrels), so a silently
    empty ranker scores 0, not absent.

    Shape: qrels is judgment-sized and the ranking is top-k-bounded
    (|Q| x k rows), so the join and the per-query fold are both tiny
    regardless of corpus size — evaluation cost never scales with the
    corpus, only with the judged set."""
    rel = qrels.select(
        F.col(q_col).alias("q_id"), F.col(doc_col).alias("doc_id")
    ).distinct()
    n_rel = rel.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_rel"))
    topk = ranking.select(
        F.col(q_col).alias("q_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("__rnk"),
    ).filter(F.col("__rnk") <= k)
    hits = (
        topk.join(rel.withColumn("__rel", F.lit(1)), ["q_id", "doc_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("__rnk").alias("__first_rel"),
        )
    )
    return n_rel.join(hits, "q_id", "left").select(
        "q_id",
        "n_rel",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
            / F.col("n_rel").cast("double")
        ).alias("recall_at_k"),
        F.coalesce(
            F.lit(1.0) / F.col("__first_rel").cast("double"), F.lit(0.0)
        ).alias("mrr"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 10,
    c: int = 60,
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    standard way to combine lexical and dense retrieval without score
    calibration: rrf(d) = sum_i 1/(c + rank_i(d)), summing only over
    rankings that returned d. Output: (q_id, doc_id, r0..r{n-1}, rrf,
    rnk) — per-source ranks kept for audit (null where a source missed
    the doc), ties broken on doc_id.

    Determinism: each term is one IEEE division of integer-derived
    values; the sum is an explicit add chain in SOURCE order (float
    addition is not associative) with absent sources contributing +0.0,
    an exact identity — the pq_topk/bm25 oracle contract. Shape: one
    union + one combinable groupBy on (q, doc) over rows that are
    already top-k-bounded per source (|Q| * k * n_sources), so fusion
    cost is independent of corpus size."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from functools import reduce as _reduce

    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(q_col).alias("q_id"),
            F.col(doc_col).alias("doc_id"),
            F.lit(i).alias("src"),
            F.col(rank_col).alias("r"),
        )
        for i, r in enumerate(rankings)
    ]
    u = _reduce(lambda a, b: a.unionByName(b), parts)
    piv = u.groupBy("q_id", "doc_id").agg(
        *[
            F.min(F.when(F.col("src") == i, F.col("r"))).alias(f"r{i}")
            for i in range(len(rankings))
        ]
    )
    acc = F.lit(0.0)
    for i in range(len(rankings)):
        acc = acc + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"r{i}").cast("double")),
            F.lit(0.0),
        )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        piv.withColumn("rrf", acc)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
