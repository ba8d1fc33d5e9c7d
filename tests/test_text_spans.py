"""Exact-substring dedup pair (functions/text.py): repeated_ngram_spans
detection (also oracle-checked via the catalog twin) and the
remove_repeated_spans rewrite, which has no SQL oracle — unit-tested on
constructed corpora."""

from pyspark.sql import functions as F

from kafka_cdc_redshift_spark.functions import text as T

BOILER = "SUBSCRIBE-TO-OUR-NEWSLETTER-NOW"  # 31 chars, shared boilerplate


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"hello{BOILER}world"),
            (2, f"abc{BOILER}xyz{BOILER}tail"),  # two occurrences in one doc
            (3, "completely unique text with no repeats at all here"),
            (4, "tiny"),  # shorter than n: never scanned
        ],
        "doc_id long, text string",
    )


def test_spans_cover_exactly_the_boilerplate(spark):
    spans = T.repeated_ngram_spans(_docs(spark), n=10, min_count=2)
    got = {
        (r.doc_id, r.span_start, r.span_end) for r in spans.collect()
    }
    # doc 1: "hello" is 5 chars -> boilerplate at [6, 6+31)
    assert (1, 6, 37) in got
    # doc 2: [4, 35) and [38, 69)
    assert (2, 4, 35) in got and (2, 38, 69) in got
    assert all(d != 3 and d != 4 for d, _, _ in got)


def test_remove_spans_rebuilds_clean_text(spark):
    docs = _docs(spark)
    spans = T.repeated_ngram_spans(docs, n=10, min_count=2)
    out = {r.doc_id: r.text for r in T.remove_repeated_spans(docs, spans).collect()}
    assert out[1] == "helloworld"
    assert out[2] == "abcxyztail"
    assert out[3] == "completely unique text with no repeats at all here"
    assert out[4] == "tiny"


def test_remove_spans_merges_overlaps_and_edges(spark):
    """Spans at document start/end and overlapping islands: the fold must
    keep exactly the uncovered segments."""
    docs = spark.createDataFrame(
        [(1, "AAAABBBBCCCC"), (2, "XXmiddleYY")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 1, 5), (1, 4, 9), (2, 9, 11)],  # overlapping; end-of-doc
        "doc_id long, span_start long, span_end long",
    )
    out = {r.doc_id: r.text for r in T.remove_repeated_spans(docs, spans).collect()}
    assert out[1] == "CCCC"  # [1,5)+[4,9) cover chars 1..8
    assert out[2] == "XXmiddle"


def test_stride_still_catches_long_repeats(spark):
    """stride>1 samples positions; a repeat longer than n + stride - 1 is
    still detected (the documented recall bound)."""
    long_rep = "0123456789" * 4  # 40 chars, appears in both docs
    docs = spark.createDataFrame(
        [(1, f"aa{long_rep}bb"), (2, f"cc{long_rep}dd")],
        "doc_id long, text string",
    )
    spans = T.repeated_ngram_spans(docs, n=10, min_count=2, stride=3)
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in spans.collect()}
    for d, start_of_rep in ((1, 3), (2, 3)):
        s, e = by_doc[d]
        # sampled spans sit within the true repeat region (no false hits)
        assert s >= start_of_rep and e <= start_of_rep + 40 + 10


def test_spans_plan_jvm_native(spark):
    plan = (
        T.repeated_ngram_spans(_docs(spark), n=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    rm = T.remove_repeated_spans(
        _docs(spark),
        T.repeated_ngram_spans(_docs(spark), n=10),
    )
    assert "BatchEvalPython" not in rm._jdf.queryExecution().executedPlan().toString()


def test_vocab_growth_invariants(spark, sf_dir):
    """Cumulative curve is monotone; total new grams == corpus distinct
    bigram count; per-slice gram totals partition the corpus multiset."""
    from kafka_cdc_redshift_spark.functions import text as T
    from kafka_cdc_redshift_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        T.vocab_growth(docs, n_slices=5).collect(), key=lambda r: r["slice"]
    )
    assert [r["slice"] for r in rows] == list(range(5))
    cums = [r["cum_grams"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["new_grams"] for r in rows)
    # exact cross-checks against direct computation
    import pyspark.sql.functions as F

    toks = T.tokens_col("text")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(F.explode(grams).alias("gram"))
    assert cums[-1] == g.distinct().count()
    assert sum(r["n_grams"] for r in rows) == g.count()


def test_collocations_ranks_planted_pair_first(spark):
    """A planted always-adjacent pair must out-lift independent fillers;
    min_count suppresses rare pairs; the lift value is the hand formula."""
    from kafka_cdc_redshift_spark.functions import text as T

    # 'new york' always adjacent (8x); filler words shuffled independence
    rows = [(i, "new york alpha beta gamma delta") for i in range(4)]
    rows += [(10 + i, "alpha gamma new york beta delta") for i in range(4)]
    rows += [(20, "rare pair appears once only here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = T.collocations(docs, k=5, min_count=5).collect()
    top = got[0]
    assert (top["w1"], top["w2"]) == ("new", "york") and top["rnk"] == 1
    n_uni = docs.selectExpr("sum(size(split(trim(lower(text)), '\\\\s+')))").first()[0]
    n_bi = n_uni - docs.count()
    want = (8 / n_bi) / ((8 / n_uni) * (8 / n_uni))
    assert top["lift"] == want  # exact: same integer-derived doubles
    assert all(r["n_pair"] >= 5 for r in got)
    assert not any(r["w1"] == "rare" for r in got)


def test_kneser_ney_hand_values(spark):
    """Exact KN probabilities on a hand-computable corpus, plus the
    probability-mass invariant: summing P over OBSERVED continuations
    of a context stays < 1 (the held-out mass is the smoothing)."""
    from kafka_cdc_redshift_spark.functions import text as T

    docs = spark.createDataFrame([(0, "a b a b a c")], "doc_id long, text string")
    got = {(r.w1, r.w2): r for r in T.kneser_ney_bigrams(docs).collect()}
    # bigrams: (a,b)x2, (b,a)x2, (a,c)x1
    # c(a .)=3, c(b .)=2; N1+(a .)=2, N1+(b .)=1
    # N1+(. b)=1, N1+(. a)=1, N1+(. c)=1; N1+(. .)=3
    assert got[("a", "b")].pkn == (2 - 0.75) / 3 + ((0.75 * 2) / 3) * (1 / 3)
    assert got[("a", "c")].pkn == (1 - 0.75) / 3 + ((0.75 * 2) / 3) * (1 / 3)
    assert got[("b", "a")].pkn == (2 - 0.75) / 2 + ((0.75 * 1) / 2) * (1 / 3)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "a")}
    mass_a = got[("a", "b")].pkn + got[("a", "c")].pkn
    assert 0 < mass_a < 1


def test_lm_surprisal_flags_shuffled_text_scores_higher(spark):
    """A doc of rare transitions must out-score docs made of the
    corpus's dominant bigram, and counts partition the doc's bigrams."""
    from kafka_cdc_redshift_spark.functions import text as T

    rows = [(i, "x y x y x y x y") for i in range(6)]
    rows.append((100, "y x q z y q x z"))  # transitions the LM rarely saw
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.lm_surprisal_flags(docs, threshold=0.2).collect()}
    assert got[100].surprise_ratio > max(got[i].surprise_ratio for i in range(6))
    for r in got.values():
        assert 0 <= r.n_surprising <= r.n_bigrams
        assert r.surprise_ratio == r.n_surprising / r.n_bigrams


def test_kneser_ney_trigrams_hand_values(spark):
    """Exact trigram KN with the bigram continuation-count backoff on a
    hand-computable corpus; mass over observed continuations < 1."""
    from kafka_cdc_redshift_spark.functions import text as T

    docs = spark.createDataFrame([(0, "a b a b a c")], "doc_id long, text string")
    got = {(r.w1, r.w2, r.w3): r for r in T.kneser_ney_trigrams(docs).collect()}
    # trigrams: (a,b,a)x2, (b,a,b)x1, (b,a,c)x1
    # c12: (a,b)->(2,1), (b,a)->(2,2); m23: (b,a)=1, (a,b)=1, (a,c)=1
    # mid2: w2=b -> (s2=1, n2dot=1); w2=a -> (s2=2, n2dot=2)
    # uni: u(a)=u(b)=u(c)=1; nall=3
    p2_ab_a = max(1 - 0.75, 0.0) / 1.0 + ((0.75 * 1) / 1.0) * (1 / 3)
    assert got[("a", "b", "a")].pkn == (
        max(2 - 0.75, 0.0) / 2.0 + ((0.75 * 1) / 2.0) * p2_ab_a
    )
    p2_ba_b = max(1 - 0.75, 0.0) / 2.0 + ((0.75 * 2) / 2.0) * (1 / 3)
    assert got[("b", "a", "b")].pkn == (
        max(1 - 0.75, 0.0) / 2.0 + ((0.75 * 2) / 2.0) * p2_ba_b
    )
    assert set(got) == {("a", "b", "a"), ("b", "a", "b"), ("b", "a", "c")}
    mass_ba = got[("b", "a", "b")].pkn + got[("b", "a", "c")].pkn
    assert 0 < mass_ba < 1
    assert all(r.c >= 1 for r in got.values())


def test_source_lm_crossscore_matrix(spark):
    """Two sources with disjoint vocabularies: the diagonal scores low
    (each corpus is probable under its own LM), the off-diagonal is
    fully OOV and scores surprise_ratio = 1.0."""
    from kafka_cdc_redshift_spark.functions import text as T

    rows = [(i, "x y x y x y", "A") for i in range(3)]
    rows += [(100 + i, "p q p q p q", "B") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r.doc_source, r.lm_source): r
           for r in T.source_lm_crossscore(docs, threshold=0.2).collect()}
    assert set(got) == {("A", "A"), ("A", "B"), ("B", "A"), ("B", "B")}
    assert got[("A", "B")].surprise_ratio == 1.0
    assert got[("B", "A")].surprise_ratio == 1.0
    assert got[("A", "A")].surprise_ratio < 1.0
    assert got[("B", "B")].surprise_ratio < 1.0
    # n_bigrams per doc_source is the same across every lm_source column
    assert got[("A", "A")].n_bigrams == got[("A", "B")].n_bigrams == 15


def test_collocations_mapside_totals_handle_null_and_single_token(spark):
    """r12 optimization pin: the unigram/bigram totals are map-side sums
    over the docs scan (not exploded-row counts) — null text must
    contribute nothing (its token array, hence size, is null) and a
    single-token doc contributes one unigram, zero bigrams. Hand
    computation: n_uni = 4+0+1+2 = 7, n_bi = 3+0+0+1 = 4, so the
    planted pair (a,b) lifts (3/4)/((3/7)*(3/7)) = 49/12."""
    from kafka_cdc_redshift_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, None), (3, "x"), (4, "a b")],
        "doc_id long, text string",
    )
    got = T.collocations(docs, min_count=2).collect()
    assert [(r.w1, r.w2, r.n_pair, r.c1, r.c2) for r in got] == [
        ("a", "b", 3, 3, 3)
    ]
    assert got[0].lift == (3 / 4) / ((3 / 7) * (3 / 7))
