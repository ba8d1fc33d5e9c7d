"""Streaming BM25 inverted-index ingest: incremental lexical retrieval
over an append-only document stream.

The retrieval twin of `DedupIngest`/`AnnIngest`: each arriving batch's
(doc_id, dl, term, tf) postings — BM25's ENTIRE index state, see
functions/retrieval.term_freqs — append to a standing table through
`AppendLog`'s atomic per-batch commit. Per-ingest cost is O(|batch|
postings): the corpus is never re-tokenized, and the standing state is
never rewritten. Document frequencies and corpus length stats are NOT
materialized: they derive from the postings at query time in one
aggregation each (both prunable to the query's terms / reducible to one
row), which keeps the streamed state a single table and the df/avgdl
values exactly consistent with the corpus at serve time — a df snapshot
maintained incrementally would go stale between folds.

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

from ..functions.retrieval import (
    bm25_topk_from_stats,
    stats_from_tf,
    term_freqs,
)
from .store import AppendLog


class RetrievalIngest:
    """Stateful streaming BM25 indexer over an `AppendLog`.

    State table (under `log.root`): `{name}_tf` — the postings relation,
    one committed directory per ingested batch.

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

    def process_batch(self, batch_df: DataFrame, batch_id) -> None:
        """Tokenize one micro-batch and append its postings. Idempotent
        per batch_id: a replayed batch is skipped on the committed-batch
        manifest, and the append itself overwrites the same batch-keyed
        directory."""
        if self.log.has_batch(self.tf_table, batch_id):
            return
        self.log.append(
            term_freqs(
                batch_df, id_col=self.id_col, text_col=self.text_col
            ),
            self.tf_table, batch_id,
        )

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
        if tf is None:
            raise ValueError(f"index {self.name!r} has no ingested batches")
        dfreq, stats = stats_from_tf(tf)
        return bm25_topk_from_stats(
            tf, dfreq, stats, queries, k=k, k1=k1, b=b, idf_mode=idf_mode,
        )

    def postings(self, spark: SparkSession) -> DataFrame | None:
        """The standing (doc_id, dl, term, tf) relation, or None before
        the first ingest."""
        return self.log.read(spark, self.tf_table)

    def compact_state(
        self, spark: SparkSession, *, min_segments: int = 8
    ) -> None:
        """Merge the per-batch postings directories (maintenance) —
        the Lucene segment-merge analog. Committed batch ids survive, so
        post-maintenance replays are still skipped."""
        self.log.compact(spark, self.tf_table, min_segments=min_segments)
