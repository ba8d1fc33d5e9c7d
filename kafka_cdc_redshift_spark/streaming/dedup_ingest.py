"""Streaming near-duplicate ingest: incremental MinHash-LSH dedup of a
document stream against the standing corpus, doc-free.

This is the crawl-ingest shape the batch operators in
`functions/dedup_text.py` were built for, wired into a micro-batch loop:
each arriving batch is

  1. deduped AGAINST THE CORPUS via `minhash_lsh_incremental` in doc-free
     mode — the corpus is represented only by its persisted band index
     ((doc_id, band, bkey)) and shingle sketches ((doc_id, sh_set)); the
     original corpus text is never re-read, let alone re-signed,
  2. deduped WITHIN ITSELF via `minhash_lsh_pairs` (the incremental
     operator's contract is strictly batch-vs-corpus; skipping this would
     silently admit intra-batch near-dups),
  3. folded into the corpus state: its band rows and sketches APPEND to
     the standing tables through `AppendLog`'s atomic per-batch commit —
     O(|batch|) written per ingest, the standing state never rewritten.

Replaying the stream batch-by-batch reports EXACTLY the pair set of a
one-shot `minhash_lsh_pairs` rebuild over the full corpus (every cross-
batch pair is found by the later doc's ingest step, every within-batch
pair by step 2 — tested e2e), and re-processing a batch after a
checkpoint retry is a no-op via the log's committed-batch manifest
(at-least-once foreachBatch -> exactly-once state, the same pattern as
the SCD2 history's transactional batch_id).

Scale shape: per-ingest cost is proportional to the batch plus its
matches. The candidate join hits the index on (band, bkey) — store the
index bucketed on those keys (BucketedTargetStore regime, plan-tested in
tests/test_curation.py) and only the batch's bands move; sketches are
fetched semi-joined to candidate ids only. Hot buckets are capped at
index-build time (`max_bucket`), bounding the worst reducer.

There is no reference analog: the reference pipeline
(cdc_util/redshift_sink.py) moves rows; corpus curation is engine-native
surface built on the same streaming shell (streaming/job.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup_text import (
    lsh_band_index,
    minhash_lsh_incremental,
    minhash_lsh_pairs,
    shingle_sketches,
)
from .store import AppendLog


class DedupIngest:
    """Stateful streaming deduper over an `AppendLog`.

    State tables (under `log.root`): `{name}_bands` (the corpus band
    index), `{name}_sketches` (verification sketches), `{name}_pairs`
    (every near-dup pair ever reported, with the batch that found it).

    Use from any micro-batch loop::

        ingest = DedupIngest(AppendLog(state_dir), name="docs")
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest.process_batch(df, bid)
        )

    or through the CDC shell's per-rule `dedup_ingest` flag
    (streaming/job.py), which feeds it each batch's parsed non-delete
    images.
    """

    def __init__(
        self,
        log: AppendLog,
        *,
        name: str = "corpus",
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 12,
        band_size: int = 2,
        threshold: float = 0.5,
        max_bucket: int | None = None,
        within_batch: bool = True,
    ):
        self.log = log
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.within_batch = within_batch

    @property
    def bands_table(self) -> str:
        return f"{self.name}_bands"

    @property
    def sketches_table(self) -> str:
        return f"{self.name}_sketches"

    @property
    def pairs_table(self) -> str:
        return f"{self.name}_pairs"

    def _lsh_kwargs(self) -> dict:
        return dict(
            id_col=self.id_col, text_col=self.text_col, n=self.n,
            num_hashes=self.num_hashes, band_size=self.band_size,
            threshold=self.threshold, max_bucket=self.max_bucket,
        )

    def process_batch(self, batch_df: DataFrame, batch_id) -> None:
        """Dedup one micro-batch against the corpus and fold it in.

        Commit order matters for at-least-once safety: pairs, then bands,
        then sketches — the SKETCH commit is the batch's "fully landed"
        marker (checked first), and every step is idempotent per
        batch_id, so a crash anywhere mid-sequence is healed by the
        retry re-running the remaining steps against unchanged corpus
        state (the batch's own bands only become corpus AFTER its pairs
        are computed, so a retry never pairs the batch with itself).
        """
        if self.log.has_batch(self.sketches_table, batch_id):
            return  # replayed batch: state already fully committed
        spark = batch_df.sparkSession
        # several consumers (cross pairs, within pairs, bands, sketches)
        # — materialize the rate-limited batch once
        batch = batch_df.select(self.id_col, self.text_col).localCheckpoint()

        kw = self._lsh_kwargs()
        index = self.log.read(spark, self.bands_table)
        sketches = self.log.read(spark, self.sketches_table)
        pairs = None
        if index is not None and sketches is not None:
            cross = minhash_lsh_incremental(
                batch, index=index, sketches=sketches, **kw
            )
            # normalize orientation to (doc_a < doc_b) so the streamed
            # union is set-comparable with a one-shot rebuild
            pairs = cross.select(
                F.least("doc_new", "doc_old").alias("doc_a"),
                F.greatest("doc_new", "doc_old").alias("doc_b"),
                "jaccard",
            )
        if self.within_batch:
            intra = minhash_lsh_pairs(batch, **kw)
            pairs = intra if pairs is None else pairs.unionByName(intra)
        if pairs is not None:
            self.log.append(
                pairs.withColumn("found_by_batch", F.lit(batch_id)),
                self.pairs_table, batch_id,
            )
        self.log.append(
            lsh_band_index(
                batch, id_col=self.id_col, text_col=self.text_col, n=self.n,
                num_hashes=self.num_hashes, band_size=self.band_size,
                max_bucket=self.max_bucket,
            ),
            self.bands_table, batch_id,
        )
        self.log.append(
            shingle_sketches(
                batch, id_col=self.id_col, text_col=self.text_col, n=self.n
            ),
            self.sketches_table, batch_id,
        )

    def pairs(self, spark: SparkSession) -> DataFrame | None:
        """All near-dup pairs reported so far (doc_a < doc_b, jaccard,
        found_by_batch)."""
        return self.log.read(spark, self.pairs_table)

    def compact_state(
        self, spark: SparkSession, *, min_segments: int = 8
    ) -> None:
        """Merge the per-batch state directories (maintenance): without
        this the band index / sketches / pairs accrue one directory per
        ingested batch forever and every candidate join pays N
        list-reads. AppendLog.compact keeps the committed-batch ids, so
        replays after maintenance are still skipped."""
        for t in (self.bands_table, self.sketches_table, self.pairs_table):
            self.log.compact(spark, t, min_segments=min_segments)
