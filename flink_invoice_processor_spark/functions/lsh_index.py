"""Persisted MinHash-LSH band store: incremental near-dup detection
against ALL history.

The batch dedup path (``dedup.minhash_lsh_pairs``) self-joins the whole
corpus's band rows — correct for a one-shot job, but an ingest pipeline
asking "is this new batch a near-dup of anything we EVER ingested?"
cannot re-band 100 TB per micro-batch.  This module is the maintained-
artifact answer, the same design as the persisted trigram index
(``functions/retrieval.py``):

- :func:`build_lsh_store` materializes the corpus band rows ONCE as a
  parquet table partitioned by ``(band_bucket, batch)`` — band_bucket =
  ``crc32(band_hash) % n_buckets`` so a probe prunes to the buckets its
  batch actually hashes into; batch = -1 is the bootstrap.
- :func:`update_lsh_store` bands ONLY the new batch (linear,
  corpus-size-independent), probes the store for candidate pairs
  (new-vs-history plus new-vs-new), and lands the batch's band rows as
  ``(band_bucket, batch=epoch)`` partitions via dynamic partition
  overwrite — a replayed epoch rewrites its own increment with
  identical content (at-least-once safe), and the probe EXCLUDES the
  replayed epoch's own store rows so re-emitted pairs are also
  bit-identical.
- :func:`compact_lsh_store` folds committed increments into the base so
  probe reads stay O(buckets) files, with the trigram index's
  crash-safety contract (duplicate band rows are collapsed by the
  probe's DISTINCT, never wrong, healed on re-run).

Pair-set contract (pytest-pinned): streaming a corpus through
``update_lsh_store`` in ANY batch split emits, across all epochs, the
EXACT pair set (including ``n_shared_bands``) of one-shot
``minhash_lsh_pairs`` over the whole corpus — each pair surfaces exactly
once, in the epoch of its later-arriving document.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import dedup as DD

META_DIR = "/_store_meta"


def _write_meta(spark: SparkSession, store_path: str, meta: dict) -> None:
    # written through Spark so any FS scheme works; range(1)+lit avoids
    # the ~4.5 s Python-worker round-trip of createDataFrame([...])
    spark.range(1).select(F.lit(json.dumps(meta)).alias("v")).coalesce(
        1
    ).write.mode("overwrite").text(store_path + META_DIR)


def read_store_meta(spark: SparkSession, store_path: str) -> dict:
    return json.loads(spark.read.text(store_path + META_DIR).head()[0])


def _bucketed_bands(df: DataFrame, meta: dict) -> DataFrame:
    return DD.band_rows(
        df,
        k=meta["k"],
        bands=meta["bands"],
        n=meta["n"],
        text_col=meta["text_col"],
    ).withColumn(
        "band_bucket",
        F.pmod(F.crc32(F.col("band_hash")), F.lit(meta["n_buckets"])),
    )


def build_lsh_store(
    df: DataFrame,
    store_path: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    n_buckets: int = 16,
    text_col: str = "text",
) -> dict:
    """Bootstrap the band store from an existing corpus (one linear band
    pass + one shuffle by bucket; rows land under ``batch=-1``).  The
    layout parameters are recorded in ``_store_meta`` so updates and
    probes can never drift from the bootstrap.  Returns the meta dict
    (hand it to :func:`update_lsh_store` to keep the streaming hot path
    free of per-epoch metadata reads)."""
    meta = {
        "k": k,
        "bands": bands,
        "n": n,
        "n_buckets": n_buckets,
        "text_col": text_col,
    }
    rows = (
        _bucketed_bands(df, meta)
        .withColumn("batch", F.lit(-1))
        # co-locate buckets pre-write: one file per bucket, not
        # tasks x buckets small files (the trigram-index lesson)
        .repartition(n_buckets, "band_bucket")
    )
    rows.write.mode("overwrite").partitionBy("band_bucket", "batch").parquet(
        store_path
    )
    _write_meta(df.sparkSession, store_path, meta)
    return meta


def update_lsh_store(
    new_docs: DataFrame,
    store_path: str,
    batch_id: int,
    meta: dict | None = None,
) -> DataFrame:
    """One ingest increment: band the new batch, emit its candidate
    pairs against everything already in the store PLUS within the batch
    itself, and append the batch's band rows under
    ``(band_bucket, batch=batch_id)`` with dynamic partition overwrite.

    Returns the candidate pairs (doc_id_a < doc_id_b, n_shared_bands).
    Work per call: one linear band pass over the batch + one equi-join
    whose store side is partition-PRUNED to the batch's band buckets —
    at most ``n_buckets`` directories, and for a small batch far fewer.
    Replay-idempotent both ways: the store write rewrites its own epoch
    partitions, and the probe filters ``batch != batch_id`` so a replay
    that finds its own half-written rows cannot double-count a pair.

    Contract: ``new_docs`` doc_ids are new (append-only ingest) and each
    doc arrives in exactly one epoch — the conditions under which the
    cumulative pair set equals the one-shot batch recompute."""
    if int(batch_id) < 0:
        # -1 is the bootstrap sentinel: accepting it would silently
        # exclude ALL history from the probe and then dynamic-overwrite
        # the bootstrap partitions with just this batch's rows
        raise ValueError(
            f"update_lsh_store: batch_id must be >= 0 (got {batch_id}); "
            "batch=-1 is the bootstrap base — rebuild with build_lsh_store"
        )
    spark = new_docs.sparkSession
    if meta is None:
        meta = read_store_meta(spark, store_path)
    batch_bands = _bucketed_bands(new_docs, meta).localCheckpoint()
    buckets = [
        r["band_bucket"]
        for r in batch_bands.select("band_bucket").distinct().collect()
    ]
    history = (
        spark.read.parquet(store_path)
        .where(
            F.col("band_bucket").isin(buckets)
            & (F.col("batch") != int(batch_id))
        )
        .select("doc_id", "band_id", "band_hash")
        # a compaction racing a replay can leave one band row in both an
        # increment and the base — distinct, so it can't double-count
        .distinct()
        .withColumn("_is_new", F.lit(False))
    )
    probe = history.unionByName(
        batch_bands.select("doc_id", "band_id", "band_hash").withColumn(
            "_is_new", F.lit(True)
        )
    )
    a = batch_bands.alias("a")
    b = probe.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            # count each match once: any order against history, strictly
            # ordered within the batch (both sides are new there)
            & (
                (~F.col("b._is_new"))
                | (F.col("a.doc_id") < F.col("b.doc_id"))
            )
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id_b"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
        .localCheckpoint()  # pairs must be realized BEFORE the store write
        # changes what the probe would read
    )
    (
        batch_bands.withColumn("batch", F.lit(int(batch_id)))
        .repartition(meta["n_buckets"], "band_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band_bucket", "batch")
        .parquet(store_path)
    )
    return pairs


def compact_lsh_store(
    spark: SparkSession,
    store_path: str,
    upto_batch: int,
    meta: dict | None = None,
) -> int:
    """Fold increment partitions ``batch <= upto_batch`` into the
    ``batch=-1`` base (same crash-safety and concurrency contract as
    ``retrieval.compact_trigram_index``: job-commit overwrite, a death
    mid-sweep leaves duplicate rows the probe's DISTINCT tolerates, and
    a re-run finishes the sweep).  Returns the number of increments
    folded."""
    import os

    from .fsops import delete_matching_dirs, list_partition_values

    if meta is None:
        meta = read_store_meta(spark, store_path)
    # partition existence from directory names, not a scan job (r14 —
    # see fsops.list_partition_values)
    batches = list_partition_values(
        spark, os.path.join(store_path, "band_bucket=*", "batch=*"), "batch"
    )
    todo = sorted(b for b in batches if b != -1 and b <= upto_batch)
    if not todo:
        return 0
    store = spark.read.parquet(store_path)
    merged = (
        store.where(F.col("batch") <= upto_batch)
        .select("doc_id", "band_id", "band_hash", "band_bucket")
        .dropDuplicates(["band_bucket", "band_hash", "band_id", "doc_id"])
        .withColumn("batch", F.lit(-1))
        .repartition(meta["n_buckets"], "band_bucket")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band_bucket", "batch")
        .parquet(store_path)
    )
    # retire the folded increments through the Hadoop FS API — the writes
    # above resolve the filesystem from the path scheme, and the cleanup
    # must too (a local glob/shutil sweep silently no-ops on HDFS/S3 and
    # the store grows forever)
    for b in todo:
        delete_matching_dirs(
            spark, os.path.join(store_path, "band_bucket=*", f"batch={b}")
        )
    return len(todo)
