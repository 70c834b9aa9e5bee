"""Streaming maintenance of the persisted trigram substring-search index.

The 100 TB search story has two halves: `functions/retrieval.py` builds
and probes the index; this job keeps it CURRENT as documents arrive.
Each micro-batch of new documents computes postings for ONLY that batch
(one linear pass, corpus-size-independent) and lands them as the index's
``(tri_bucket, batch=epoch)`` partitions via dynamic partition overwrite
— a replayed epoch (foreachBatch is at-least-once) rewrites its own
increment with identical content instead of appending duplicates, the
same idempotence contract as ``streaming/matview.py`` and the sketch
rollups.  Searches running concurrently keep probing the already-
committed buckets; they pick up a new batch's documents once its files
land (no index rebuild, no search downtime).

One-lineage contract (same as the DQ gate / CMS rollup): epoch ids must
map stably to batches, i.e. one checkpoint lineage per index path — a
fresh checkpoint over an existing index would reuse epoch ids and
dynamic overwrite would DROP the old lineage's increments for those ids.
Bootstrap the index with ``build_trigram_index`` (its partitions live
under ``batch=-1`` and are never touched by the stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..functions.retrieval import (
    _read_index_meta,
    compact_trigram_index,
    update_trigram_index,
)


def index_micro_batch(
    batch_df: DataFrame, epoch_id: int, index_path: str,
    meta: dict | None = None,
) -> None:
    """One maintenance increment: postings for this batch's documents →
    the index's (bucket, batch=epoch) partitions, replay-idempotent.
    Pass ``meta`` (read once at job start) to keep the per-epoch hot
    path free of metadata read jobs."""
    if batch_df.isEmpty():
        return
    update_trigram_index(batch_df, index_path, batch_id=epoch_id, meta=meta)


def run_trigram_index_job(
    docs: DataFrame,
    index_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the index-maintenance job over a streaming documents
    DataFrame (columns: doc_id LONG, text STRING).  The index at
    ``index_path`` must already exist (``build_trigram_index`` — its
    ``_index_meta`` carries n_buckets/text_col so the stream can never
    drift from the bootstrap layout).  The meta is read ONCE here — it
    is immutable after bootstrap, and a per-epoch read job at a 2 s
    trigger is a pure tax on the streaming hot path.

    ``compact_every=N`` folds increments into the base every N epochs
    (``compact_trigram_index`` up to ``epoch_id - 1``): epochs below the
    current one are checkpoint-committed, so a crash-replay can only
    target the current epoch — whose increment is NOT compacted and
    stays replay-idempotent.  A replay that re-runs the compaction
    itself is idempotent too (see ``compact_trigram_index``).  Without
    it, a long-running stream accumulates one partition per epoch and
    probe reads open O(epochs) files."""
    meta = _read_index_meta(docs.sparkSession, index_path)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        index_micro_batch(batch_df, epoch_id, index_path, meta=meta)
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
            compact_trigram_index(
                batch_df.sparkSession, index_path, epoch_id - 1, meta=meta
            )

    return (
        docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
