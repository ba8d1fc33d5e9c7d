"""Streaming BM25 inverted-index ingest: incremental lexical retrieval
over an append-only document stream.

The retrieval twin of `DedupIngest`/`AnnIngest`: each arriving batch's
(doc_id, dl, term, tf) postings — BM25's ENTIRE index state, see
functions/retrieval.term_freqs — append to a standing table through
`AppendLog`'s atomic per-batch commit, alongside a 1-row mergeable
(n_docs, sum_dl) stats delta. Per-ingest cost is O(|batch| postings):
the corpus is never re-tokenized, and the standing state is never
rewritten. Document frequencies are NOT materialized: they aggregate
from the QUERY-TERM-PRUNED postings at serve time (bm25_topk_from_stats
prunes before the census), so df is always exactly corpus-consistent —
a full df snapshot maintained incrementally would go stale between
folds; corpus length constants fold from the O(#batches) stats rows,
never a postings scan.

Serving goes through `bm25_topk_from_stats`, the SAME code path the
batch operator uses, so streamed top-k == one-shot `bm25_topk` over the
concatenated corpus exactly (tested), and replays are no-ops via the
log's committed-batch manifest (at-least-once foreachBatch ->
exactly-once index state).

Scale shape: at 100 TB the postings table is the classic sharded
inverted index — store it partitioned/bucketed by term and a query's
broadcast term set prunes to the matching shards; per-batch appends are
new postings files within each term bucket, exactly how Lucene-style
segment ingest maps onto a lakehouse table.

No reference analog: the reference pipeline moves rows; retrieval is
engine-native surface on the same streaming shell (streaming/job.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..functions.retrieval import bm25_topk_from_stats, term_freqs
from .store import AppendLog


class RetrievalIngest:
    """Stateful streaming BM25 indexer over an `AppendLog`.

    State tables (under `log.root`): `{name}_tf` — the postings
    relation — and `{name}_stats` — 1-row-per-batch (n_docs, sum_dl)
    deltas; one committed directory per ingested batch each, segment-
    merged by `compact_state` on the maintenance cycle.

    Use from any micro-batch loop::

        ingest = RetrievalIngest(AppendLog(state_dir), name="docs")
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest.process_batch(df, bid)
        )

    or through the CDC shell's per-rule `bm25_ingest` flag
    (streaming/job.py), which feeds it each batch's parsed non-delete
    images. Assumes an append-only document stream (the crawl-ingest
    contract shared with DedupIngest); updated documents would need a
    delete-log-style tombstone pass at fold time.
    """

    def __init__(
        self,
        log: AppendLog,
        *,
        name: str = "corpus",
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.log = log
        self.name = name
        self.id_col = id_col
        self.text_col = text_col

    @property
    def tf_table(self) -> str:
        return f"{self.name}_tf"

    @property
    def stats_table(self) -> str:
        return f"{self.name}_stats"

    def process_batch(self, batch_df: DataFrame, batch_id) -> None:
        """Tokenize one micro-batch, append its postings plus a 1-row
        (n_docs, sum_dl) stats delta — the corpus constants BM25 needs,
        maintained as mergeable integer sums so serving never scans the
        full postings to derive them. Idempotent per batch_id; the STATS
        commit is the batch's "fully landed" marker (checked first), so
        a crash between the two appends heals on retry — the dedup_ingest
        commit-order pattern."""
        if self.log.has_batch(self.stats_table, batch_id):
            return
        tf = term_freqs(
            batch_df, id_col=self.id_col, text_col=self.text_col
        ).localCheckpoint()
        self.log.append(tf, self.tf_table, batch_id)
        stats = (
            tf.groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").alias("sum_dl"),
            )
        )
        self.log.append(stats, self.stats_table, batch_id)

    def topk(
        self,
        queries: DataFrame,
        *,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        idf_mode: str = "raw",
    ) -> DataFrame:
        """BM25 top-k against the standing index — identical results to
        batch `bm25_topk` over the concatenated corpus (tested), without
        ever re-tokenizing it."""
        spark = queries.sparkSession
        tf = self.log.read(spark, self.tf_table)
        per_batch = self.log.read(spark, self.stats_table)
        if tf is None or per_batch is None:
            raise ValueError(f"index {self.name!r} has no ingested batches")
        # corpus constants fold from the per-batch integer sums —
        # O(#batches) rows, never a scan of the postings themselves
        stats = per_batch.agg(
            F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
        )
        return bm25_topk_from_stats(
            tf, stats, queries, k=k, k1=k1, b=b, idf_mode=idf_mode,
        )

    def postings(self, spark: SparkSession) -> DataFrame | None:
        """The standing (doc_id, dl, term, tf) relation, or None before
        the first ingest."""
        return self.log.read(spark, self.tf_table)

    def compact_state(
        self, spark: SparkSession, *, min_segments: int = 8
    ) -> None:
        """Merge the per-batch postings/stats directories (maintenance)
        — the Lucene segment-merge analog. Committed batch ids survive,
        so post-maintenance replays are still skipped."""
        self.log.compact(spark, self.tf_table, min_segments=min_segments)
        self.log.compact(spark, self.stats_table, min_segments=min_segments)
