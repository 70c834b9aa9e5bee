"""Streaming maintenance of the persisted MinHash-LSH band store:
continuous near-dup detection of arriving documents against ALL history.

Each micro-batch is banded (linear in the batch), probed against the
store (partition-pruned equi-join, see ``functions/lsh_index.py``), and
appended as its own ``(band_bucket, batch=epoch)`` partitions; the
candidate pairs it surfaced land in a queryable parquet PAIRS table
partitioned by epoch.  Both writes are dynamic-partition-overwrites of
the epoch's own partitions, so a replayed epoch (foreachBatch is
at-least-once) rewrites identical content instead of duplicating —
the matview/trigram-index idempotence contract.

One-lineage contract (same as ``streaming/index_maintenance.py``):
epoch ids must map stably to batches — one checkpoint lineage per store
path.  Bootstrap with ``build_lsh_store`` (its rows live under
``batch=-1``, never touched by the stream).

Cumulative-equivalence contract (pytest-pinned in
``tests/test_lsh_maintenance.py``): after streaming a corpus in any
split, the union of all epochs' pairs tables equals one-shot
``dedup.minhash_lsh_pairs`` over the whole corpus, n_shared_bands
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.lsh_index import (
    compact_lsh_store,
    read_store_meta,
    update_lsh_store,
)


def lsh_micro_batch(
    batch_df: DataFrame,
    epoch_id: int,
    store_path: str,
    pairs_path: str,
    meta: dict | None = None,
) -> None:
    """One ingest increment: probe + store append via
    ``update_lsh_store``, then land the surfaced pairs under the pairs
    table's ``batch=epoch`` partition (replay rewrites it)."""
    if batch_df.isEmpty():
        return
    pairs = update_lsh_store(batch_df, store_path, batch_id=epoch_id, meta=meta)
    (
        pairs.withColumn("batch", F.lit(int(epoch_id)))
        .coalesce(1)  # pair increments are tiny; one file per epoch
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(pairs_path)
    )


def init_pairs_table(spark, pairs_path: str) -> None:
    """Make ``pairs_path`` readable from epoch zero: land a zero-row
    schema-bearing file under a ``batch=-2`` sentinel partition (mode
    ``ignore`` — a restart never touches an existing table).  Without
    this, epochs that are empty or surface no candidate pairs write
    nothing (dynamic overwrite of zero partitions), so the table would
    not EXIST until the first pair-producing epoch and every reader in
    the interim would die on path-not-found.  The sentinel partition
    holds no rows, so no query's answer changes; dynamic overwrites only
    ever rewrite their own ``batch=epoch`` partition and never touch
    it."""
    empty = spark.createDataFrame(
        [], "doc_id_a long, doc_id_b long, n_shared_bands long"
    ).repartition(1)
    empty.write.mode("ignore").parquet(pairs_path.rstrip("/") + "/batch=-2")


def run_lsh_dedup_job(
    docs: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the dedup-against-history job over a streaming documents
    DataFrame (doc_id LONG, text STRING).  The store at ``store_path``
    must exist (``build_lsh_store`` — its ``_store_meta`` pins
    k/bands/n/n_buckets/text_col so the stream can never drift from the
    bootstrap layout); the meta is read ONCE here.  The pairs table is
    initialized empty-but-readable before the stream starts
    (:func:`init_pairs_table`).

    ``compact_every=N`` folds committed increments (epochs
    ``<= epoch-1``) into the base every N epochs; the current epoch's
    increment is never compacted, so crash-replay stays idempotent."""
    meta = read_store_meta(docs.sparkSession, store_path)
    init_pairs_table(docs.sparkSession, pairs_path)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        lsh_micro_batch(batch_df, epoch_id, store_path, pairs_path, meta=meta)
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
            compact_lsh_store(
                batch_df.sparkSession, store_path, epoch_id - 1, meta=meta
            )

    return (
        docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def fuzzy_contamination_from_store(
    spark,
    pairs_path: str,
    docs: DataFrame,
    eval_ids: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy eval-set decontamination SERVED from the maintained pair
    store: the union of all epochs' candidate pairs (the cumulative-
    equivalence contract makes it exactly one-shot
    ``dedup.minhash_lsh_pairs`` over everything ingested) → exact
    n-gram-Jaccard verification against the corpus → the contamination
    report (``dedup.fuzzy_contamination``) — so a curation run checks
    new training data against benchmark near-dups WITHOUT re-banding
    history.  The recall stage is pre-paid by the stream; per call this
    is the candidate-bounded verify stage + two broadcast membership
    joins.  Batch/stream parity is pinned in
    ``tests/test_lsh_maintenance.py`` (any split of the corpus yields
    bit-identical reports)."""
    from ..functions import dedup as DD

    cand = spark.read.parquet(pairs_path).select(
        "doc_id_a", "doc_id_b", "n_shared_bands"
    )
    verified = DD.lsh_verified_pairs(
        docs, n=n, threshold=threshold, candidates=cand
    )
    return DD.fuzzy_contamination(verified, eval_ids)
