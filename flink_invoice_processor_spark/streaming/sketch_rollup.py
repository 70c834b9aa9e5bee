"""Streaming KMV sketch rollup: mergeable distinct-count partials
maintained across micro-batches.

The reference's only continuous aggregation is the count-or-timeout
response batcher (`REF/process/response/InvoiceResponseBatchProcessor.java:28-96`);
this is the 100 TB extension: a ``foreachBatch`` sink that keeps a tiny
per-segment KMV sketch table up to date as events stream in.  Each
micro-batch is sketched independently (``kmv_sketch`` — bounded k rows
per segment) and MERGED into the stored partials (``kmv_merge`` — the
KMV merge law makes this exact: merge(sketch(A), sketch(B)) ==
sketch(A ∪ B)).  Estimates over the stored table therefore equal the
batch-computed estimates over everything ever seen, while per-batch work
and stored state stay O(segments * k) — never a full distinct-count
shuffle, never unbounded state.

The sketch table is plain parquet, version-directory swapped (write new
version, then retarget via the ``_VERSION`` marker) so a concurrent
reader never sees a half-written table and a crashed batch never
corrupts the previous state; restart re-merges idempotently (KMV merge
is idempotent: re-merging the same rows changes nothing).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.sketches import (
    bloom_words,
    cms_bucket,
    cms_counters,
    kmv_merge,
    kmv_sketch,
)

_VERSION = "_VERSION"

_SKETCH_SCHEMA = "segment STRING, h LONG"


def read_versioned(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Current rows of a version-swapped table, or an empty frame with
    ``schema`` before the first batch.  The one resolver every
    versioned-table reader (KMV/CMS/bloom rollups, the CDC snapshot)
    delegates to, so a marker-format change has a single home."""
    version = _current_version(path)
    if version is None:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(os.path.join(path, version))


def read_sketch_table(spark: SparkSession, path: str) -> DataFrame:
    """Current sketch partials, or an empty frame before the first batch."""
    return read_versioned(spark, path, _SKETCH_SCHEMA)


def _marker_state(path: str) -> tuple[str | None, int | None]:
    """(current version dir, last merged batch id) from the marker.
    One file holds both so they commit atomically together."""
    marker = os.path.join(path, _VERSION)
    if not os.path.exists(marker):
        return None, None
    with open(marker) as fh:
        parts = fh.read().split()
    version = parts[0] if parts else None
    batch = int(parts[1]) if len(parts) > 1 else None
    return version, batch


def _current_version(path: str) -> str | None:
    return _marker_state(path)[0]


def _swap_in(df: DataFrame, path: str, batch_id: int) -> None:
    # never write into a dir the marker may currently reference: a
    # replayed batch id (epoch retry, or a fresh-checkpoint stream whose
    # ids restart at 0 against an existing table) would otherwise
    # overwrite the LIVE version in place, opening exactly the
    # half-written-state window the version swap exists to close.  Pick
    # the first unused suffix instead; the swap stays atomic.
    prev = _current_version(path)
    version = f"v{batch_id}"
    n = 0
    while version == prev or os.path.exists(os.path.join(path, version)):
        n += 1
        version = f"v{batch_id}_{n}"
    df.write.mode("overwrite").parquet(os.path.join(path, version))
    tmp = os.path.join(path, _VERSION + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{version} {batch_id}")
    os.replace(tmp, os.path.join(path, _VERSION))
    # retire superseded version dirs, keeping the new current one and the
    # immediately prior marker target (a reader that resolved the marker
    # just before the swap may still be scanning it); without this the
    # table grows one tiny dir per micro-batch forever
    import shutil

    keep = {version, prev}
    for entry in os.listdir(path):
        if entry.startswith("v") and entry not in keep:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)


def kmv_rollup_writer(
    segment: Column,
    value: Column,
    table_path: str,
    k: int = 64,
):
    """``foreachBatch`` function maintaining the KMV sketch table.

    Usage::

        stream.writeStream.foreachBatch(
            kmv_rollup_writer(F.col("event_type"), F.col("user_id"), path)
        )
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        batch_sketch = kmv_sketch(batch_df, segment, value, k=k)
        prev = read_sketch_table(spark, table_path)
        merged = kmv_merge(prev.unionByName(batch_sketch), k=k)
        # materialize BEFORE writing: `merged` reads the version dir the
        # swap is about to supersede (new version dir, so no self-overwrite,
        # but localCheckpoint keeps the write plan from re-scanning input)
        merged = merged.localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


def cms_rollup_writer(key, table_path: str, depth: int = 3, width: int = 1024):
    """``foreachBatch`` function maintaining a Count-Min counter table
    across micro-batches (cells merge by summation — the CMS merge law).
    State stays <= depth*width rows however much data streams through;
    estimates over the stored table upper-bound every key's true count
    over everything seen.  Same version-directory swap as the KMV rollup."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        # CMS cells merge by SUM, which is NOT idempotent: a replayed
        # epoch (foreachBatch is at-least-once) whose previous attempt
        # already committed the swap would double-count every key in the
        # batch.  The marker records the last merged batch id atomically
        # with the version, so a replay of an already-merged batch is a
        # no-op.  (KMV needs no fence: min-k of a set re-merges to
        # itself.)  Consequence: one CMS table belongs to ONE stream
        # lineage — a fresh checkpoint restarts ids at 0 and its batches
        # would be fenced off; use a new table path for a new stream.
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return
        batch_counters = cms_counters(batch_df, key, depth=depth, width=width)
        prev = read_cms_table(spark, table_path)
        merged = (
            prev.unionByName(batch_counters)
            .groupBy("row_i", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        ).localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


def bloom_rollup_writer(
    value: Column, table_path: str, m_bits: int = 1020, k: int = 3
):
    """``foreachBatch`` function maintaining a Bloom membership filter
    across micro-batches: each batch's values become a partial filter
    (``bloom_words``) that bit-ORs into the stored words.

    Of the three rollups this one needs the LEAST machinery: bit-OR is
    the merge law AND idempotent, so — like KMV's min-k and unlike CMS's
    SUM — a replayed at-least-once epoch re-ORs the same bits to no
    effect, and no batch-id fence is required.  State is ≤ m_bits/60
    rows forever; the stored filter answers "was this key EVER seen on
    the stream" via ``bloom_probe`` with the one-sided no-false-negative
    guarantee.  Same version-directory swap as the other rollups."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        batch_words = bloom_words(batch_df, value, m_bits=m_bits, k=k)
        prev = read_bloom_table(spark, table_path)
        # no localCheckpoint before the swap (r12): _swap_in's write is
        # the single action that materializes the merge, and it reads
        # the PRIOR version dir, which _swap_in both writes around
        # (fresh dir) and retains through the marker flip ("immediately
        # prior" survives cleanup) — a pre-write checkpoint was one
        # whole extra materialization job per epoch for rows that are
        # <= m_bits/60 anyway
        merged = (
            prev.unionByName(batch_words)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        _swap_in(merged, table_path, batch_id)

    return process


def histogram_rollup_writer(key: Column, value: Column, table_path: str):
    """``foreachBatch`` function maintaining a per-key VALUE HISTOGRAM
    (k, val, cnt) across micro-batches — the exact-statistics rollup:
    histograms merge by summing counts per (key, val)
    (``functions/stats.value_histogram``), so exact medians / p50-p99 /
    MAD / winsorized sums computed from the stored table
    (``stats.quantiles_from_histogram``) equal the same statistics over
    every raw row ever streamed.  Where KMV/CMS/HLL trade exactness for
    fixed state, this one's state is bounded by the VALUE DOMAIN
    (integer cents, ms latencies: thousands of distinct values per key
    however many billions of rows stream through) — the same contract
    functions/stats.py documents for the batch operators.

    SUM-merge is not idempotent, so like the CMS rollup (and unlike
    KMV/bloom) a replayed at-least-once epoch is fenced on the batch id
    recorded atomically with the version marker; one table belongs to
    one stream lineage."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return
        from ..functions.stats import value_histogram

        batch_hist = value_histogram(
            batch_df.select(
                key.cast("string").alias("k"), value.cast("long").alias("v")
            ),
            "k",
            "v",
        )
        prev = read_histogram_table(spark, table_path)
        merged = (
            prev.unionByName(batch_hist)
            .groupBy("k", "val")
            .agg(F.sum("cnt").alias("cnt"))
        ).localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


_HIST_SCHEMA = "k STRING, val LONG, cnt LONG"


def read_histogram_table(spark: SparkSession, path: str) -> DataFrame:
    """Current histogram rows, or empty before the first batch."""
    return read_versioned(spark, path, _HIST_SCHEMA)


_BLOOM_SCHEMA = "word_idx LONG, word LONG"


def read_bloom_table(spark: SparkSession, path: str) -> DataFrame:
    """Current Bloom filter words, or empty before the first batch."""
    return read_versioned(spark, path, _BLOOM_SCHEMA)


_CMS_SCHEMA = "row_i INT, bucket LONG, cnt LONG"


def read_cms_table(spark: SparkSession, path: str) -> DataFrame:
    """Current CMS counter partials, or empty before the first batch."""
    return read_versioned(spark, path, _CMS_SCHEMA)


def cms_estimate(counters: DataFrame, keys: DataFrame, key, depth: int = 3,
                 width: int = 1024) -> DataFrame:
    """Point estimates for the given keys from stored counters: min over
    the depth rows of each key's bucket counts (upper bound on the true
    count; missing cells mean a count of 0).  Broadcast hash joins per
    depth level — see functions/sketches.py for why never a MapType."""
    est = keys.select(key.cast("string").alias("hh_key"))
    for i in range(depth):
        ci = counters.where(F.col("row_i") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        est = est.withColumn(f"_b{i}", cms_bucket(i, width)).join(
            F.broadcast(ci), f"_b{i}", "left"
        )
    return est.select(
        "hh_key",
        F.least(
            *[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)]
        ).alias("est_count"),
    )


_VECSTAT_SCHEMA = (
    "i INT, j INT, n LONG, sp DECIMAL(38,0), s DECIMAL(38,0),"
    " mn LONG, mx LONG"
)


def vector_stats_rollup_writer(table_path: str, vec_col: str = "embedding"):
    """``foreachBatch`` function maintaining the embedding-QA moment
    partials (functions/similarity.vector_stat_partials) across
    micro-batches — the vector-table quality report (dim_stats) AND the
    exact d×d covariance (PCA/whitening input) served over everything
    ever streamed, while per-batch work stays one pair-expansion
    aggregate and stored state stays d(d+1)/2 rows forever.

    Merge law: (SUM n, SUM sp, SUM s, MIN mn, MAX mx) per (i, j) —
    partials over micro-batches merge to exactly the partials over the
    union, so ``covariance_from_partials`` / ``dim_stats_from_partials``
    on the stored table equal the batch operators over all raw vectors
    (pinned in tests/test_streaming_vector_stats.py).  SUM-merge is not
    idempotent, so like the CMS/histogram rollups a replayed
    at-least-once epoch is fenced on the batch id recorded atomically
    with the version marker; one table belongs to one stream lineage."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return
        from ..functions.similarity import vector_stat_partials

        batch_part = vector_stat_partials(batch_df, vec_col)
        prev = read_vector_stats_table(spark, table_path)
        merged = (
            prev.unionByName(batch_part)
            .groupBy("i", "j")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sp").cast("decimal(38,0)").alias("sp"),
                F.sum("s").cast("decimal(38,0)").alias("s"),
                F.min("mn").alias("mn"),
                F.max("mx").alias("mx"),
            )
        ).localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


def read_vector_stats_table(spark: SparkSession, path: str) -> DataFrame:
    """Current moment partials, or empty before the first batch."""
    return read_versioned(spark, path, _VECSTAT_SCHEMA)
