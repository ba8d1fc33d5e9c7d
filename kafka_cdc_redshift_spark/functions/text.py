"""Text analysis operators for large-scale training-data pipelines.

All of these are pure native column expressions (JVM-side, codegen'd) — no
Python UDFs — so they scan-scale linearly: at 100 TB each is a single
map-only pass over the documents table (no shuffle except the grouped
variants).

Portability contract with the DuckDB oracles: tokenization is
split-on-whitespace of trim(lower(text)); hash60(s) is the first 60 bits of
md5 interpreted as a positive int64 — identical in Spark
(conv(substr(md5,1,15),16,10)) and DuckDB (('0x'||substr(md5,1,15))::BIGINT).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import spread

EN_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it")

# marker-token lists for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "es"),
    "fr": ("le", "les", "des", "est"),
}


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def hash60(c: str | Column) -> Column:
    """Portable 60-bit positive hash (top 15 hex chars of md5)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def token_stats(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    df = spread(df)
    """Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    estimate (chars/4 — the common rule-of-thumb bytes-per-token)."""
    toks = tokens_col(text_col)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("est_bpe_tokens"),
    )


def quality_score(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    df = spread(df)
    """Quality scoring: stopword ratio + alphabetic-char ratio combined into
    a [0,1] score (pure double arithmetic on exact int counts)."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    stop_ratio = _hits(toks, EN_STOPWORDS).cast("double") / n_tok.cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")).cast("double")
        / F.length(F.col(text_col)).cast("double")
    )
    return df.select(
        id_col,
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        (alpha_ratio * 0.5 + (F.lit(1.0) - stop_ratio) * 0.5).alias("quality"),
    )


def lang_id(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    df = spread(df)
    """Marker-token language ID: count per-language marker hits, argmax with
    fixed priority order (en > de > es > fr), 'und' when nothing hits."""
    toks = tokens_col(text_col)
    hit_cols = {lang: _hits(toks, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = reduce(lambda a, b: F.greatest(a, b), hit_cols.values())
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        id_col,
        pred.alias("lang_pred"),
        *[hit_cols[lang].alias(f"{lang}_hits") for lang in langs],
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flag_cols(
    text_col: str | Column = "text",
    *,
    min_words: int = 20,
    max_words: int = 1000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_ttr: float = 0.4,
    min_req_stopwords: int = 1,
) -> dict[str, Column]:
    """The Gopher quality flags as named column EXPRESSIONS over
    `text_col` — usable either keyed by document (`gopher_flags`) or
    attached row-by-row to a changelog whose rows are not unique per key
    (the streaming quality gate: a CDC batch routinely carries several
    images per pk with different text, and each image must be judged on
    its OWN text — joining flags back by pk would let any passing image
    vouch for the rest)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens_col(c)
    n_words = F.size(toks)
    word_chars = F.length(F.regexp_replace(F.trim(F.lower(c)), r"\s+", ""))
    mean_wl = word_chars.cast("double") / n_words.cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_words.cast("double")
    n_req_stop = F.size(
        F.filter(F.array_distinct(toks), lambda t: t.isin(*GOPHER_STOPWORDS))
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_ttr = ttr >= min_ttr
    ok_stop = n_req_stop >= min_req_stopwords
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "ttr": ttr,
        "n_req_stopwords": n_req_stop,
        "ok_word_count": ok_words,
        "ok_mean_word_len": ok_mwl,
        "ok_ttr": ok_ttr,
        "ok_stopwords": ok_stop,
        "keep": ok_words & ok_mwl & ok_ttr & ok_stop,
    }


def gopher_flags(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_ttr: float = 0.4,
    min_req_stopwords: int = 1,
) -> DataFrame:
    """Gopher-style rule-based quality filtering (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, type-token ratio, and
    required-stopword presence, each emitted as an auditable flag plus a
    combined `keep`.

    All counts are exact integers and every ratio is a single double
    division of those integers, so the flags replay bit-for-bit in the SQL
    oracle. Mean word length avoids a higher-order aggregate (interpreted,
    not codegen'd — NOTES.md #3): sum(len(word)) == len(text with all
    whitespace removed), a plain regexp_replace+length that stays inside
    WholeStageCodegen. Map-only scan: no shuffle at any scale."""
    df = spread(df)
    flags = gopher_flag_cols(
        text_col,
        min_words=min_words, max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        min_ttr=min_ttr, min_req_stopwords=min_req_stopwords,
    )
    return df.select(id_col, *[c.alias(n) for n, c in flags.items()])


def fingerprint(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    df = spread(df)
    """Document fingerprinting: md5 over the sorted distinct token set (word-
    order/duplication insensitive), grouped to fingerprint clusters."""
    toks = tokens_col(text_col)
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every k-char gram, slide a window of w hashes, keep each window's
    minimum, distinct-ify -> (doc_id, fp) rows.

    Guarantees of the scheme: any shared substring of length >= k + w - 1
    between two documents yields at least one shared fingerprint, while only
    ~2/(w+1) of the gram hashes are kept. All computed as native array
    expressions (sequence/transform/slice/array_min) inside one map-only
    pass — no Python, no shuffle.
    """
    from pyspark.sql import Window

    # build the (cheap) gram STRINGS in the array; hash them after the
    # explode so md5 runs in whole-stage codegen, not per-element inside an
    # interpreted higher-order-function lambda (~10x difference measured)
    t = F.trim(F.lower(F.col(text_col)))
    n_grams = F.length(t) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(0))),
        lambda i: F.substring(t, i, F.lit(k)),
    )
    ex = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(grams).alias("i", "gram"),
    ).filter(F.col("gram").isNotNull())
    h = ex.select("doc_id", "i", hash60("gram").alias("h"))
    # sliding minimum via a bounded window frame (codegen'd, one shuffle)
    wp = Window.partitionBy("doc_id")
    ws = wp.orderBy("i").rowsBetween(0, w - 1)
    mins = h.select(
        "doc_id", "i",
        F.min("h").over(ws).alias("fp"),
        F.max("i").over(wp).alias("n"),
    )
    # valid window starts: i <= n-(w-1); short docs (n < w) keep i == 0 only
    valid = mins.filter(
        F.col("i") <= F.greatest(F.col("n") - (w - 1), F.lit(0))
    )
    return valid.select("doc_id", "fp").distinct()


def winnow_match_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 5,
    max_df: int | None = 20,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints — the
    plagiarism / near-copy detection shape. Fingerprint-keyed self-join:
    the fp is the shuffle key, so co-occurring docs meet without a cross
    join (same scale argument as jaccard_pairs).

    `max_df` drops fingerprints present in more than that many documents
    before pairing: a fingerprint shared by thousands of documents carries
    no copy signal but contributes O(df^2) join pairs — the standard
    stop-fingerprint cut."""
    fps = winnow_fingerprints(df, id_col=id_col, text_col=text_col, k=k, w=w)
    if max_df is not None:
        # materialize the winnowed set once: the stop-fingerprint census and
        # the pair join would otherwise each re-evaluate the whole gram-hash
        # pipeline through lineage (the fingerprints are the ~2/(w+1)
        # winnowed fraction — exactly the artifact a production pipeline
        # persists before pairing)
        fps = fps.localCheckpoint()
        hot = (
            fps.groupBy("fp").count()
            .filter(F.col("count") > max_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    pairs = (
        fps.alias("a")
        .join(
            fps.hint("merge").alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs


# regexes shared with the DuckDB oracle — restricted to syntax that means
# the same thing in Java regex (Spark) and RE2 (DuckDB)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_redact(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing for training corpora: mask emails / IPv4s / phone
    numbers with typed placeholder tokens and count what was masked.

    Pure regexp_replace/regexp_count column expressions — map-only,
    codegen'd, no Python; at 100 TB this is one scan. Order matters: emails
    first (their domains would otherwise partially match nothing), then
    IPs (dotted digits), then phones.
    """
    df = spread(df)
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE_RE, "<PHONE>")
    return df.select(
        id_col,
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
    )


def repetition_score(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition metrics (the Gopher/MassiveText-style quality signals):
    duplicate-token fraction, top-token frequency share, and duplicate
    2-gram fraction. Degenerate, loopy machine text scores high on all
    three. Map-only native array expressions — one scan at any scale."""
    df = spread(df)
    toks = tokens_col(text_col)
    n = F.size(toks)
    dup_tok = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    # top-token share: max multiplicity / n, via aggregate over the distinct set
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda t: t == u)),
        )
    )
    # zip_with pads the shorter side with null, so its last element would be
    # a spurious 1-gram — slice the result back to the n-1 true bigrams
    grams = F.slice(
        F.zip_with(
            toks, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        1, F.greatest(n - 1, F.lit(0)),
    )
    n_g = F.size(grams)
    dup_gram = F.when(
        n_g > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n_g.cast("double"),
    ).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        dup_tok.alias("dup_token_frac"),
        (top_cnt.cast("double") / n.cast("double")).alias("top_token_share"),
        dup_gram.alias("dup_2gram_frac"),
    )


def ngram_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus-level top-k bigrams: (gram, cnt) — the vocabulary/collocation
    census a tokenizer-training or contamination-analysis step reads.

    One explode + one groupBy(gram) shuffle with map-side partial agg, then
    a global top-k via orderBy+limit — Spark plans that as
    TakeOrderedAndProject (per-partition heaps, no single-partition sort),
    so the top-k costs no extra shuffle at any scale. Deterministic
    boundary: ties at rank k break on the gram string."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    grams = F.slice(
        F.zip_with(
            toks, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        1, F.greatest(n - 1, F.lit(0)),
    )
    return (
        spread(df)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def corpus_group_stats(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...] = ("lang", "source"),
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-group corpus census: doc count, total size, and exact
    p25/p50/p75 of the size column — the mix dashboard a curation run
    publishes per (language, source).

    `percentile` is Spark's EXACT sort-based percentile (not approx):
    deterministic, and over integer sizes at dyadic fractions (.25/.5/.75)
    the interpolation arithmetic is exact in IEEE terms, so DuckDB's
    quantile_cont reproduces it bit-for-bit. One groupBy shuffle; the
    per-group sort is partition-local. (Use approx_percentile instead when
    a single group would exceed executor memory.)"""
    pct = F.percentile(F.col(size_col), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        spread(df)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col)).alias("total_size"),
            pct.alias("p"),
        )
        .select(
            *group_cols,
            "n_docs",
            "total_size",
            F.col("p")[0].alias("p25_size"),
            F.col("p")[1].alias("p50_size"),
            F.col("p")[2].alias("p75_size"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    idf is the RAW ratio N/df (no log): products and divisions of exact
    integer counts are IEEE-deterministic across engines, so the DuckDB
    oracle matches bit-for-bit — ln() is libm-dependent and would flake
    the value-hash comparison.

    Shape at scale: one explode+groupBy shuffle keyed (doc, term) for tf,
    one groupBy keyed term for df (map-side partial aggs on both), and the
    tf<-df join is keyed on term — the standard two-shuffle tf-idf. The
    final top-k window re-partitions by doc only over k' <= |vocab per doc|
    surviving rows.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    terms = spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )
    # tf feeds TWO consumers (the df-count agg and the scoring join):
    # materialize it once instead of replaying the explode+groupBy
    # lineage per consumer (the dedup_semantic/q11 treatment)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term", "tf", "df",
        (
            F.col("tf").cast("double")
            * F.lit(float(n_docs)) / F.col("df").cast("double")
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def token_commonness(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max_count: int = 5,
) -> DataFrame:
    """Corpus-relative commonness scoring (a ccnet-style LM filter reduced
    to exact arithmetic): how ordinary is each document's vocabulary,
    measured against the corpus's own unigram counts.

    Emits per doc: `n_tokens`, `avg_token_freq` (mean corpus count of the
    doc's tokens) and `rare_ratio` (fraction of tokens whose corpus count
    is <= rare_max_count). Docs of globally rare tokens (OCR noise,
    boilerplate hashes, other languages) score low/high respectively —
    the corpus-relative signal the doc-local quality ops can't see.

    Determinism contract: all aggregates are exact integer sums (token
    counts), combined with single IEEE divisions — no ln() (libm-
    dependent, see tfidf_top_terms) and no double accumulation (order-
    dependent), so the DuckDB oracle matches bit-for-bit.

    Shape at scale: explode -> one groupBy shuffle keyed on token for the
    unigram census, token-keyed join back (map-side partial aggs both
    sides), one groupBy shuffle keyed on doc. The census relation is
    |vocab|-sized — join it un-broadcast; AQE will broadcast when small.
    """
    toks = spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("tok")
    )
    census = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        toks.join(census, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_token_freq"),
            (
                F.sum((F.col("cnt") <= rare_max_count).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_ratio"),
        )
    )


def repeated_ngram_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    min_count: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Corpus-repeated substring spans per document — the detection half
    of exact-substring deduplication (the "drop any 50-gram that appears
    twice in the corpus" pass a training-data pipeline runs AFTER
    document-level dedup, since boilerplate repeats across otherwise
    unique documents). Returns (doc_id, span_start, span_end) character
    intervals (1-based, end-exclusive) covering every position whose
    length-`n` gram occurs >= `min_count` times corpus-wide; overlapping
    or touching gram hits are merged via gaps-and-islands, so spans are
    maximal and disjoint.

    Shape at scale: positions explode map-side (length-n+1 grams per
    doc), grams are 60-bit hashes so the census shuffle moves ints (the
    gram text never shuffles); repeated positions semi-join the census
    and one per-doc window builds the islands. `stride > 1` samples every
    stride-th position — the documented recall/cost dial for the first
    corpus pass (a repeat longer than n + stride - 1 chars is still
    caught); stride=1 is exact and is what the oracle replays.

    No reference analog (the reference moves CDC rows; this is
    training-corpus surface).
    """
    from pyspark.sql import Window

    docs = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    ).filter(F.length("__t") >= n)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, length(__t) - {n} + 1, {stride})")
        ).alias("pos"),
        F.col("__t"),
    ).select(
        "doc_id", "pos", hash60(F.substring(F.col("__t"), F.col("pos"), n)).alias("__h")
    )
    census = grams.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    hits = grams.join(
        census.filter(F.col("__c") >= min_count).select("__h"), "__h", "semi"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        hits.withColumn("__prev", F.lag("pos").over(w))
        # a new island starts when this gram no longer overlaps/touches
        # the previous hit's span [prev, prev + n)
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | (F.col("pos") > F.col("__prev") + n))
            .cast("long"),
        )
        .withColumn("__isl", F.sum("__new").over(w))
    )
    return (
        islands.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def remove_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply `repeated_ngram_spans` output: cut every span out of the
    text (keeping the segments between spans) — the rewrite half of
    exact-substring dedup. Native expressions only: spans fold per doc
    with `aggregate`, so the rewrite is map-side after one left join;
    docs without spans pass through untouched.
    """
    agg = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = df.join(agg, id_col, "left")
    # fold: walk spans left->right keeping [cursor, start) segments
    cleaned = F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
        F.aggregate(
            "__spans",
            F.struct(
                # long accumulator: span bounds may be int or long and the
                # struct type must stay fixed across the fold
                F.lit(1).cast("long").alias("cur"),
                F.lit("").cast("string").alias("acc"),
            ),
            lambda acc, s: F.struct(
                F.greatest(
                    acc["cur"], s["span_end"].cast("long")
                ).alias("cur"),
                F.concat(
                    acc["acc"],
                    F.when(
                        s["span_start"] > acc["cur"],
                        F.col(text_col).substr(
                            acc["cur"], s["span_start"] - acc["cur"]
                        ),
                    ).otherwise(F.lit("")),
                ).alias("acc"),
            ),
            lambda acc: F.concat(
                acc["acc"],
                F.col(text_col).substr(
                    acc["cur"], F.length(text_col) - acc["cur"] + 1
                ),
            ),
        )
    )
    return joined.withColumn(text_col, cleaned).drop("__spans")


#: GPT-2-style pre-tokenizer pattern, restricted to syntax both Java regex
#: (Spark) and RE2 (DuckDB oracle) accept — no lookaheads: contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs,
#: bare apostrophes, whitespace runs. Parity is regression-tested.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|'|\s+"
)


def bpe_pretokens_col(text: str | Column = "text") -> Column:
    """Subword-boundary pre-tokens under the GPT-2-style regex — the real
    counting unit a BPE tokenizer starts from (each pre-token splits into
    >= 1 BPE tokens), vs `token_stats`'s chars/4 rule of thumb.
    Whitespace-only matches are dropped; every other match is one
    pre-token. Codegen'd regexp, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)),
        lambda t: F.trim(t) != "",
    )


def pretoken_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc counting under all three unit systems a data pipeline
    quotes sizes in: whitespace words, GPT-2-style pre-tokens (a LOWER
    bound on BPE tokens — merges only split pre-tokens further), and the
    chars/4 estimate. Map-only scan."""
    pre = bpe_pretokens_col(text_col)
    return spread(df).select(
        id_col,
        F.size(tokens_col(text_col)).alias("n_words"),
        F.size(pre).alias("n_pretokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("est_bpe_tokens"),
    )


def vocab_growth(
    df: DataFrame,
    *,
    n_slices: int = 10,
    gram_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary growth: how many NEW distinct n-grams each
    successive slice of the corpus contributes — the curve that tells a
    crawl pipeline whether more data still buys vocabulary (sub-linear
    flattening) or the corpus is still novelty-rich, and the denominator
    for dedup-rate sanity checks. Emits one row per slice:
    (slice, n_docs, n_grams, new_grams, cum_grams).

    Slices are deterministic hash buckets of the doc id (hash60 % n),
    consumed in slice order 0..n-1 — the standard random-order Heaps
    measurement, reproducible across runs/engines, and assigned entirely
    map-side (an ntile over a global doc order would funnel every doc id
    through ONE window task at corpus scale; the hash slice never
    shuffles anything to a single reducer). A gram's first-seen slice is
    min(slice) — one groupBy shuffle keyed on the 60-bit gram hash (text
    never shuffles, the repeated_ngram_spans convention); the cumulative
    curve is a window over n_slices rows, trivially small.
    """
    from pyspark.sql import Window

    toks = tokens_col(text_col)
    grams_arr = F.when(
        F.size(toks) >= gram_n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (gram_n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, gram_n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sl = (hash60(F.col(id_col).cast("string")) % n_slices).cast("int")
    g = (
        spread(df)
        .select(
            sl.alias("slice"),
            F.col(id_col).alias("doc_id"),
            F.explode_outer(grams_arr).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .select("slice", "doc_id", hash60("gram").alias("gh"))
    )
    per_slice = g.groupBy("slice").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    firsts = (
        g.groupBy("gh")
        .agg(F.min("slice").alias("first_slice"))
        .groupBy("first_slice")
        .agg(F.count(F.lit(1)).alias("new_grams"))
    )
    w = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_slice.join(
            firsts.withColumnRenamed("first_slice", "slice"), "slice", "left"
        )
        .withColumn("new_grams", F.coalesce("new_grams", F.lit(0)))
        .withColumn("cum_grams", F.sum("new_grams").over(w))
        .select("slice", "n_docs", "n_grams", "new_grams", "cum_grams")
    )


def collocations(
    df: DataFrame,
    *,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by LIFT — the phrase-
    mining step that seeds a multi-word vocabulary before tokenizer
    training:

        lift = (c_xy / N_bi) / ((c_x / N_uni) * (c_y / N_uni))

    i.e. observed bigram probability over the independence expectation —
    PMI without the log (ln is libm-dependent, the tfidf convention;
    lift is a monotone transform of PMI so the ranking is PMI's).
    `min_count` floors the pair count: rare pairs have unstable lift
    (one co-occurrence of two hapaxes maximizes it).

    Shape at scale: one explode each for the unigram and bigram censuses
    (both combinable groupBys); the |vocab|-sized unigram census is
    materialized once (localCheckpoint) because the pair census joins it
    TWICE on the word key — without the barrier each join leg carries
    its own copy of the corpus explode + census shuffle (guide §2.2).
    Both totals are map-side sums over ONE docs scan (token count =
    size(tokens), pair count = size-1 when >= 2) — exact integers equal
    to counting the exploded rows, with no explode and no shuffle.
    Top-k is orderBy+limit (TakeOrdered — distributed partial
    top-k, never a single-partition window over the censuses); the rank
    column is assigned over the k survivors only. Ties break on the
    pair text."""
    from pyspark.sql import Window

    toks = tokens_col(text_col)
    uni = (
        spread(df)
        .select(F.explode_outer(toks).alias("w"))
        .filter(F.col("w").isNotNull())
    )
    u_census = uni.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    # token/pair totals map-side from the docs scan: a doc contributes
    # size(tokens) unigrams (null text contributes none — its token
    # array, hence size, is null and sum skips it) and size-1 bigrams
    # when it has >= 2 tokens (greatest(null-1, 0) = 0 keeps null text
    # at zero). Exact integer identities of the exploded-row counts.
    dl = F.size(toks)
    totals = df.agg(
        F.sum(dl).alias("n_uni"),
        F.sum(F.greatest(dl - F.lit(1), F.lit(0))).alias("n_bi"),
    )
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        spread(df)
        .select(F.explode_outer(pairs_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.w1", "p.w2")
    )
    b_census = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    lift = (
        F.col("n_pair").cast("double") / F.col("n_bi").cast("double")
    ) / (
        (F.col("c1").cast("double") / F.col("n_uni").cast("double"))
        * (F.col("c2").cast("double") / F.col("n_uni").cast("double"))
    )
    scored = (
        b_census.filter(F.col("n_pair") >= min_count)
        .join(
            u_census.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
            "w1",
        )
        .join(
            u_census.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "n_pair", "c1", "c2", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return scored.withColumn("rnk", F.row_number().over(w).cast("int"))


def kneser_ney_bigrams(
    df: DataFrame,
    *,
    discount: float = 0.75,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the count side of
    training a KenLM-style n-gram LM on the corpus (perplexity filtering,
    domain LM scoring a la CCNet):

        P(w2|w1) = max(c(w1 w2) - d, 0)/c(w1 .)
                   + (d * N1+(w1 .)/c(w1 .)) * (N1+(. w2)/N1+(. .))

    with c(w1 .) = total bigrams starting w1 (not the raw unigram count —
    a document's last token opens no bigram), N1+ the distinct-
    continuation / distinct-context / distinct-type counts. Emits
    (w1, w2, c, pkn) for pairs with c >= min_count.

    Determinism: every census is an exact integer aggregate; the
    probability is divisions/multiplications of those integers plus the
    discount literal in one pinned parenthesization — no ln, no
    accumulation-order hazard (the per-pair formula has a fixed number
    of terms), so a SQL oracle replays it bit-for-bit.

    Shape at scale: one explode into the bigram census (combinable
    groupBy keyed (w1, w2)); the context/continuation censuses derive
    from that census (groupBys keyed w1 / w2 — vocab-sized, never
    corpus-sized); the type total reduces to one broadcast row. The
    census feeds four consumers, so it is localCheckpoint'ed once."""
    toks = tokens_col(text_col)
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bc = (
        spread(df)
        .select(F.explode_outer(pairs_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    w1s = bc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    w2s = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1w2"))
    tot = bc.agg(F.count(F.lit(1)).alias("n1all"))
    d = float(discount)
    c_d = F.col("c").cast("double")
    c1_d = F.col("c1").cast("double")
    pkn = (
        F.greatest(c_d - F.lit(d), F.lit(0.0)) / c1_d
    ) + (
        (F.lit(d) * F.col("n1w1").cast("double")) / c1_d
    ) * (
        F.col("n1w2").cast("double") / F.col("n1all").cast("double")
    )
    return (
        bc.filter(F.col("c") >= min_count)
        .join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", pkn.alias("pkn"))
    )


def kneser_ney_trigrams(
    df: DataFrame,
    *,
    discount: float = 0.75,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM probabilities with the bigram
    continuation-count backoff tier — KenLM's production order-3 shape
    (Chen & Goodman 1998 interpolated KN):

        P3(w3|w1 w2) = max(c(w1w2w3) - d, 0)/c(w1w2 .)
                       + (d * N1+(w1w2 .)/c(w1w2 .)) * P2(w3|w2)
        P2(w3|w2)    = max(N1+(. w2w3) - d, 0)/N1+(. w2 .)
                       + (d * N1+(w2 .)/N1+(. w2 .)) * (N1+(. w3)/N1+(. .))

    where every lower-order quantity is a CONTINUATION (distinct-type)
    count derived from the trigram census — the defining KN move: the
    backoff distribution asks "how many contexts has this continuation
    opened", not "how often did it occur". Emits (w1, w2, w3, c, pkn)
    for trigrams with c >= min_count.

    Determinism: one corpus explode into the exact integer trigram
    census; every derived census is a combinable groupBy OVER the census
    (type counts, never corpus re-scans); the probability is one pinned
    parenthesization of those integers plus the discount literal — no
    ln, no accumulation-order hazard — so a SQL oracle replays it
    bit-for-bit.

    Shape at scale: the census feeds five derived censuses via one
    checkpoint; joins are keyed (w1,w2), (w2,w3), (w2), (w3) — all
    vocab-bounded relations, far below corpus size — plus one broadcast
    1-row type total."""
    toks = tokens_col(text_col)
    tri_arr = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
                F.element_at(toks, i + 2).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    tc = (
        spread(df)
        .select(F.explode_outer(tri_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy("p.w1", "p.w2", "p.w3")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # highest order: c(w1w2 .) and N1+(w1w2 .)
    c12 = tc.groupBy("w1", "w2").agg(
        F.sum("c").alias("c12"), F.count(F.lit(1)).alias("n12")
    )
    # continuation census: N1+(. w2w3) = distinct w1 opening (w2, w3) —
    # the row set of this census IS the bigram-type relation the whole
    # backoff tier derives from
    m23 = (
        tc.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("m23"))
        .localCheckpoint(eager=False)
    )
    mid2 = m23.groupBy("w2").agg(
        F.sum("m23").alias("s2"),          # N1+(. w2 .)
        F.count(F.lit(1)).alias("n2dot"),  # N1+(w2 .)
    )
    uni = m23.groupBy("w3").agg(F.count(F.lit(1)).alias("u3"))  # N1+(. w3)
    tot = m23.agg(F.count(F.lit(1)).alias("nall"))              # N1+(. .)
    d = float(discount)
    p2 = (
        F.greatest(F.col("m23").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("s2").cast("double")
    ) + (
        (F.lit(d) * F.col("n2dot").cast("double"))
        / F.col("s2").cast("double")
    ) * (
        F.col("u3").cast("double") / F.col("nall").cast("double")
    )
    pkn = (
        F.greatest(F.col("c").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c12").cast("double")
    ) + (
        (F.lit(d) * F.col("n12").cast("double"))
        / F.col("c12").cast("double")
    ) * p2
    return (
        tc.filter(F.col("c") >= min_count)
        .join(c12, ["w1", "w2"])
        .join(m23, ["w2", "w3"])
        .join(mid2, "w2")
        .join(uni, "w3")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "w3", "c", pkn.alias("pkn"))
    )


def source_lm_crossscore(
    df: DataFrame,
    *,
    threshold: float = 0.01,
    discount: float = 0.75,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-similarity matrix by cross-source LM scoring (the CCNet /
    domain-mixing shape): train an interpolated Kneser-Ney bigram LM per
    source, then score EVERY source's bigrams under EVERY source's LM.
    Emits one row per (doc_source, lm_source): total bigrams, how many
    are improbable under that LM (P < threshold, with out-of-vocabulary
    bigrams counted surprising — an unseen transition is the strongest
    possible surprisal), and the ratio. Low ratio on the diagonal,
    rising off-diagonal with domain distance — the matrix a data-mixing
    pass reads to weight sources by similarity to a target domain.

    Exact-count convention (lm_surprisal_flags): threshold counts keep
    every aggregate an exact integer — no ln, no order-dependent float
    sums — so the oracle replays the whole matrix bit-for-bit.

    Shape at scale: ONE corpus explode builds the per-(source, w1, w2)
    bigram census, which then serves BOTH sides — the per-source LM
    censuses derive from it (vocab-bounded combinable groupBys) and the
    scoring side reuses it as the (doc_source, bigram, multiplicity)
    relation, so the |sources|^2 matrix costs census x |sources| join
    rows, never |sources|^2 corpus scans."""
    toks = tokens_col(text_col)
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bc = (
        spread(df)
        .select(
            F.col(source_col).alias("src"), F.explode_outer(pairs_arr).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .groupBy("src", "p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    w1s = bc.groupBy("src", "w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    w2s = bc.groupBy("src", "w2").agg(F.count(F.lit(1)).alias("n1w2"))
    tot = bc.groupBy("src").agg(F.count(F.lit(1)).alias("n1all"))
    d = float(discount)
    pkn = (
        F.greatest(F.col("c").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c1").cast("double")
    ) + (
        (F.lit(d) * F.col("n1w1").cast("double"))
        / F.col("c1").cast("double")
    ) * (
        F.col("n1w2").cast("double") / F.col("n1all").cast("double")
    )
    lm = (
        bc.join(w1s, ["src", "w1"])
        .join(w2s, ["src", "w2"])
        .join(tot, "src")
        .select(
            F.col("src").alias("lm_source"), "w1", "w2", pkn.alias("pkn")
        )
    )
    docs_side = bc.select(
        F.col("src").alias("doc_source"), "w1", "w2", F.col("c").alias("m")
    )
    # every (doc bigram, lm_source) cell must exist — OOV cells carry no
    # LM row, so the null-fill has to come from an explicit cross with
    # the (broadcast, |sources|-row) source list, THEN the left join
    sources = tot.select(F.col("src").alias("lm_source"))
    surprising = (
        F.col("pkn").isNull() | (F.col("pkn") < F.lit(float(threshold)))
    ).cast("long") * F.col("m")
    return (
        docs_side.crossJoin(F.broadcast(sources))
        .join(lm, ["lm_source", "w1", "w2"], "left")
        .groupBy("doc_source", "lm_source")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(surprising).alias("n_surprising"),
            (
                F.sum(surprising).cast("double")
                / F.sum("m").cast("double")
            ).alias("surprise_ratio"),
        )
    )


def lm_surprisal_flags(
    df: DataFrame,
    *,
    threshold: float = 0.01,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Perplexity-style quality filtering in a cross-engine-exact form:
    score every document by how many of its bigrams are IMPROBABLE under
    the corpus's own Kneser-Ney bigram LM. Emits (doc_id, n_bigrams,
    n_surprising, surprise_ratio) — a doc full of low-probability
    transitions (OCR noise, shuffled text, wrong language) scores high.

    A mean log-prob (true perplexity) would sum doubles in arbitrary
    order and need ln(); counting bigrams with P < threshold keeps every
    aggregate an exact integer and the ratio one IEEE division — the
    same decision boundary a perplexity filter thresholds, minus the
    monotone transform.

    Shape at scale: the doc-bigram relation joins the LM table keyed
    (w1, w2) — the LM is vocab^2-bounded (far smaller than the corpus)
    and `broadcast_lm=True` (default) PINS the broadcast-hash plan
    rather than leaving it to AQE's runtime estimate (the
    contamination_score pattern); pass False only when the LM side is
    genuinely too wide to ship. Then one combinable groupBy on doc_id.
    The LM itself reuses kneser_ney_bigrams (min_count=1 so every
    observed bigram has a probability)."""
    lm = kneser_ney_bigrams(
        df, discount=discount, min_count=1, id_col=id_col, text_col=text_col
    ).select("w1", "w2", "pkn")
    if broadcast_lm:
        lm = F.broadcast(lm)
    toks = tokens_col(text_col)
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    db = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"), F.explode_outer(pairs_arr).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select("doc_id", "p.w1", "p.w2")
    )
    return (
        db.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("pkn") < threshold).cast("long")).alias(
                "n_surprising"
            ),
            (
                F.sum((F.col("pkn") < threshold).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("surprise_ratio"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    *,
    n_buckets: int = 3,
    threshold: float = 0.01,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CCNet-style per-source quality tiers: rank every document within
    its source by LM surprisal (the exact threshold-count proxy,
    `lm_surprisal_flags`) and cut each source into `n_buckets`
    equal-height tiers — head (most LM-probable), middle, tail. The
    standard head/middle/tail split CCNet feeds to mixing decisions,
    kept cross-engine-exact: the ranking key is (surprise_ratio,
    doc_id), a total order over exact-integer-derived doubles, and
    ntile is the SQL-standard equal-height cut both engines implement
    identically. Documents with no bigrams (< 2 tokens) carry no LM
    evidence and are excluded (the inner join), matching CCNet's
    convention of scoring only scorable text.

    Shape at scale: lm_surprisal_flags' one corpus explode + vocab-
    bounded LM join, then a RANGE-partitioned exact rank — NOT a
    per-source ntile window. `source` is a low-cardinality key, so
    `ntile OVER (PARTITION BY source)` would funnel every source's
    entire doc population through one reducer at 100×. Instead:

      1. repartitionByRange on the full ranking key
         (source, surprise_ratio, doc_id) — each source spreads
         across many partitions, in key order;
      2. a tiny (partitions × sources)-row census gives every
         (pid, source) slice its global rank offset and each source
         its total n — both via windows over the CENSUS (bounded
         input), broadcast back;
      3. per-row rank = offset + row_number within (pid, source) —
         the window key is fine-grained, each task sorts ~n/P rows;
      4. the bucket is the closed-form ntile assignment from
         (rank, n) in exact integer arithmetic, applied map-side.

    Rank exactness does not depend on where the range boundaries
    land (sampling or AQE coalescing only move work between tasks),
    so the output is deterministic and replays the SQL-standard
    ntile bit-for-bit: the first n % k buckets take ceil(n/k) rows,
    the rest floor(n/k). Steps 1-3 are util.range_partitioned_rank,
    shared with every other exact-rank-over-low-cardinality-key
    consumer."""
    from ..util import range_partitioned_rank

    flags = lm_surprisal_flags(
        df, threshold=threshold, discount=discount,
        id_col=id_col, text_col=text_col,
    )
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    # Materialize the scored relation ONCE before ranking:
    # range_partitioned_rank evaluates its input three times (the
    # boundary sample, the offset census broadcast, and the main ranked
    # path). For the raw-table consumers that is three cheap column-
    # pruned scans, but here the input carries the WHOLE surprisal
    # pipeline (corpus bigram explode + vocab-bounded LM join + doc
    # groupBy) — re-deriving that per consumer triples the query's
    # dominant cost (guide §2.2). The checkpoint holds only 4 narrow
    # columns per scorable doc (id, source, 2 counters), far smaller
    # than the bigram relation the LM pipeline shuffles, so the
    # materialization is the cheap side of the trade at any scale.
    scored = src.join(flags, "doc_id").localCheckpoint(eager=False)
    ranked = range_partitioned_rank(
        scored, ["source"], ["surprise_ratio", "doc_id"]
    )
    from ..util import closed_form_ntile

    bucket = closed_form_ntile(n_buckets)
    tier = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return ranked.withColumn("bucket", bucket).select(
        "doc_id", "source", "n_bigrams", "surprise_ratio",
        "bucket", tier.alias("tier"),
    )
