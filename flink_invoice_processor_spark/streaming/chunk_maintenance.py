"""Streaming chunk-level dedup-against-history: a persisted
content-defined chunk-digest store maintained per micro-batch, with a
Bloom membership rollup as the probe fast path.

The batch operator family (``dedup.content_defined_chunks`` /
``cdc_chunk_duplicates``) answers "which variable-length passages are
duplicated?" for a corpus it can re-scan; this job answers it
CONTINUOUSLY — each arriving micro-batch of documents is chunked (a
pure map), its chunk digests are checked against everything ever
ingested, and a per-epoch duplicate report lands in a queryable
parquet table — without ever re-chunking history.  This is the
storage-dedup incremental path at training-corpus scale: a copied or
lightly-edited document arriving months after the original still hits
the original's chunks (CDC boundaries re-synchronize around edits).

Per-epoch work, in order:

1. chunk the batch and aggregate per digest (batch-bounded);
2. probe the maintained BLOOM rollup (broadcast word lookups — the
   ``sketch_rollup.bloom_rollup_writer`` table): bloom-miss digests are
   DEFINITELY new (no false negatives) and skip the store entirely;
3. only bloom-HIT digests join the digest store for exact history
   membership — the join reads only the store buckets those digests
   hash to (driver-side bucket list → partition pruning, the
   ``lsh_index`` discipline), and the exact join removes Bloom false
   positives;
4. the epoch's duplicate report (digests already seen in any PRIOR
   epoch) lands under ``batch=epoch`` of the report table;
5. ALL the batch's digest rows land under their ``(bucket,
   batch=epoch)`` store partitions (dynamic overwrite — a replayed
   epoch rewrites identical content), and the digests OR into the
   Bloom rollup (bit-OR is idempotent, so the replay needs no fence).

Cumulative-equivalence contract (pytest-pinned in
``tests/test_chunk_maintenance.py``): after streaming a corpus in ANY
split, aggregating the store's per-epoch rows by digest equals the
one-shot ``cdc_chunk_duplicates`` over the whole corpus, bit for bit
(counts sum because each document arrives in exactly ONE epoch — the
same one-lineage contract every maintenance job here carries).
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.dedup import content_defined_chunks
from ..functions.sketches import bloom_probe
from .sketch_rollup import bloom_rollup_writer, read_bloom_table

logger = logging.getLogger(__name__)

META_DIR = "/_chunk_store_meta"
BLOOM_DIR = "/_bloom"  # underscore prefix: hidden from parquet listings


def _bloom_dir(meta: dict) -> str:
    """The store-relative Bloom table dir for the CURRENT bloom
    generation.  Rebuilds (``compact_chunk_store(...,
    rebuild_bloom_m_bits=...)``) land in a NEW generation dir and then
    commit by meta update, so a probe always reads words whose layout
    matches the m_bits it probes with — a crash between the two steps
    leaves the old (consistent) pair live."""
    gen = meta.get("bloom_gen", 0)
    return BLOOM_DIR if gen == 0 else f"{BLOOM_DIR}_g{gen}"

_STORE_SCHEMA = (
    "digest STRING, chunk STRING, n_tokens LONG, n_docs LONG,"
    " n_occurrences LONG, first_doc_id LONG, bucket LONG, batch INT"
)


def _write_meta(spark: SparkSession, store_path: str, meta: dict) -> None:
    # range(1)+lit, NOT createDataFrame([...]): a Python-local-list write
    # round-trips through a Python worker and costs ~4.5 s per call — the
    # same measured tax build_trigram_index documents; it dominated
    # init_chunk_store until r11
    spark.range(1).select(
        F.lit(json.dumps(meta, sort_keys=True)).alias("j")
    ).coalesce(1).write.mode("overwrite").text(store_path + META_DIR)


def read_chunk_meta(spark: SparkSession, store_path: str) -> dict:
    return json.loads(
        spark.read.text(store_path + META_DIR).collect()[0][0]
    )


def _batch_digest_rows(
    df: DataFrame, window: int, n_buckets: int, text_col: str
) -> DataFrame:
    """Per-digest batch aggregate: (digest, chunk, n_tokens, n_docs,
    n_occurrences, first_doc_id, bucket).  Batch-bounded: the chunk
    explode is a pure map and the aggregate has map-side combine."""
    chunks = content_defined_chunks(df, window, text_col)
    return (
        chunks.groupBy("chunk")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .select(
            F.md5("chunk").alias("digest"),
            "chunk",
            "n_tokens",
            "n_docs",
            "n_occurrences",
            "first_doc_id",
        )
        .withColumn("bucket", F.crc32(F.col("digest")) % n_buckets)
    )


def init_chunk_store(
    spark: SparkSession,
    store_path: str,
    window: int = 16,
    n_buckets: int = 16,
    m_bits: int = 61440,
    k: int = 3,
    text_col: str = "text",
) -> dict:
    """Create an EMPTY but fully readable store: the meta file (layout
    parameters pinned so the stream can never drift from them) and a
    zero-row schema-bearing sentinel partition (``batch=-2``, the
    ``init_pairs_table`` discipline — without it, readers die on
    path-not-found until the first epoch lands).

    Re-init is guarded: on an already-initialized store the pinned meta
    is returned unchanged when the requested parameters match, and a
    ``ValueError`` is raised when they differ — silently rewriting the
    meta would invalidate bucket assignment and chunk boundaries
    against the rows already landed.

    Bloom capacity: ``m_bits`` bounds the DISTINCT digests the fast
    path stays useful for — at k=3 the false-positive rate passes ~50%
    near ``n ≈ m_bits/4`` (~15K digests at the 61440 default) and keeps
    climbing as the store grows, at which point most batch digests probe
    the store exactly (correctness unaffected — the exact join removes
    false positives — but the skip-the-store benefit is gone).  Size
    m_bits for the store's LIFETIME distinct-digest count, or recarve
    it at fold points with ``compact_chunk_store(...,
    rebuild_bloom_m_bits=...)``; saturation is observable per epoch via
    the ``bloom-hit fraction`` INFO log in ``update_chunk_store``."""
    meta = {
        "window": int(window),
        "n_buckets": int(n_buckets),
        "m_bits": int(m_bits),
        "k": int(k),
        "text_col": text_col,
    }
    os.makedirs(store_path, exist_ok=True)
    if os.path.exists(store_path + META_DIR):
        existing = read_chunk_meta(spark, store_path)
        if existing != meta:
            raise ValueError(
                "chunk store already initialized with different layout "
                f"parameters: pinned {existing}, requested {meta}"
            )
    else:
        _write_meta(spark, store_path, meta)
    # idempotent either way (mode ignore) — also repairs a crash between
    # the meta write and the sentinel write
    empty = spark.createDataFrame([], _STORE_SCHEMA).drop("bucket", "batch")
    (
        empty.repartition(1)
        .write.mode("ignore")
        .parquet(store_path + "/bucket=-2/batch=-2")
    )
    return meta


def _read_store(spark: SparkSession, store_path: str) -> DataFrame:
    return spark.read.option("basePath", store_path).parquet(store_path)


def update_chunk_store(
    batch_df: DataFrame,
    store_path: str,
    batch_id: int,
    meta: dict | None = None,
) -> DataFrame:
    """One ingest increment.  Returns the epoch's duplicate report —
    (digest, chunk, n_tokens, n_docs, n_occurrences, first_doc_id,
    first_doc_id_history) for batch digests already present in a PRIOR
    epoch — realized (localCheckpoint) BEFORE any write, so the
    report can never observe the epoch's own rows."""
    spark = batch_df.sparkSession
    if meta is None:
        meta = read_chunk_meta(spark, store_path)
    # bucket-partitioned at the checkpoint: the store write below then
    # lands each partition's rows straight into its bucket dir with no
    # second shuffle, and every downstream scan schedules n_buckets
    # tasks instead of a full shuffle-partition fan
    rows = (
        _batch_digest_rows(
            batch_df, meta["window"], meta["n_buckets"], meta["text_col"]
        )
        .repartition(meta["n_buckets"], "bucket")
        .localCheckpoint()
    )

    # fast path: bloom-miss digests are definitely new (one-sided
    # guarantee), so only bloom hits ever touch the store.  Before the
    # first bloom version exists (a fresh store's epoch 0) there is no
    # history at all — skip the probe jobs entirely, the report is
    # empty by construction.
    from .sketch_rollup import _current_version

    if _current_version(store_path + _bloom_dir(meta)) is None:
        # no bloom version yet == nothing ever landed: there is no
        # history, so skip the candidate/bucket jobs entirely (r12 —
        # the where(lit(False)) placeholder still cost a distinct+
        # collect job per fresh-store epoch)
        cand = None
    else:
        bloom = read_bloom_table(spark, store_path + _bloom_dir(meta))
        probed = bloom_probe(
            rows, F.col("digest"), bloom,
            m_bits=meta["m_bits"], k=meta["k"],
        )
        cand = rows.join(
            probed.where(F.col("bloom_hit")).select(
                F.col("value").alias("digest")
            ),
            "digest",
            "left_semi",
        )
    # saturation observability (fixed-capacity filter, unbounded digest
    # store — see init_chunk_store): a hit fraction near 1.0 on a batch
    # of mostly-new content means the filter is saturated and the fast
    # path has degraded to probing the store for nearly every digest.
    # Level-gated so the extra aggregate job only runs when someone is
    # listening.
    if _current_version(store_path + _bloom_dir(meta)) is not None and \
            logger.isEnabledFor(logging.INFO):
        stats = probed.agg(
            F.count("*").alias("n"),
            F.sum(F.col("bloom_hit").cast("long")).alias("hits"),
        ).collect()[0]
        if stats["n"]:
            logger.info(
                "chunk store %s epoch %s: bloom-hit fraction %.3f (%d/%d "
                "distinct digests probe the store)",
                store_path, batch_id, stats["hits"] / stats["n"],
                stats["hits"], stats["n"],
            )

    # exact membership against PRIOR epochs only, bucket-pruned: the
    # scan reads only the store buckets the candidate digests hash to.
    # ``batch < batch_id`` (not ``!=``): base generations are negative
    # so folded history stays included, and a direct-API replay of an
    # OLDER epoch still sees only what preceded it — the replay-
    # idempotence of the report is pinned structurally, not by the
    # one-replay-at-a-time streaming assumption.
    buckets = [] if cand is None else [
        r["bucket"] for r in cand.select("bucket").distinct().collect()
    ]
    if buckets:
        history = (
            _current_rows(spark, store_path)
            .where(F.col("batch") < int(batch_id))
            .where(F.col("bucket").isin(buckets))
            .groupBy("digest")
            .agg(F.min("first_doc_id").alias("first_doc_id_history"))
        )
        report = cand.join(history, "digest").select(
            "digest", "chunk", "n_tokens", "n_docs", "n_occurrences",
            "first_doc_id", "first_doc_id_history",
        ).localCheckpoint()
    else:
        # already store-independent (no reads behind it) — a checkpoint
        # job would materialize an empty DataFrame for nothing
        report = spark.createDataFrame(
            [],
            "digest STRING, chunk STRING, n_tokens LONG, n_docs LONG,"
            " n_occurrences LONG, first_doc_id LONG,"
            " first_doc_id_history LONG",
        )

    # bloom FIRST, store second: a crash between the two writes must
    # leave the bloom an OVER-approximation of the store (false
    # positives — removed by the exact join) and never an under-
    # approximation (false negatives would silently miss duplicates
    # forever).  Bit-OR is idempotent, so a replayed epoch re-ORs to
    # no effect and needs no fence.
    bloom_rollup_writer(
        F.col("digest"),
        store_path + _bloom_dir(meta),
        m_bits=meta["m_bits"],
        k=meta["k"],
    )(rows, batch_id)
    # land the epoch: ALL batch digests under (bucket, batch=epoch) —
    # dynamic overwrite makes a replayed epoch rewrite identical rows
    # (rows are already bucket-partitioned from the checkpoint, so the
    # write is shuffle-free: one file per bucket)
    (
        rows.withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket", "batch")
        .parquet(store_path)
    )
    return report


def chunk_duplicates_from_store(
    spark: SparkSession, store_path: str, min_docs: int = 2
) -> DataFrame:
    """The batch ``cdc_chunk_duplicates`` report SERVED from the
    maintained store: aggregate the per-epoch digest rows (counts SUM
    because every document arrived in exactly one epoch; chunk/
    n_tokens agree across epochs so ``min`` is the one value) — equals
    the one-shot operator over everything ingested, bit for bit
    (pytest-pinned).  Reads the LIVE rows only (current base
    generation + unfolded epochs), so a compaction — or its crash
    window's orphaned generation — never double-counts."""
    store = _current_rows(spark, store_path)
    return (
        store.groupBy("digest")
        .agg(
            F.min("chunk").alias("chunk"),
            F.min("n_tokens").alias("n_tokens"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select("chunk", "n_tokens", "n_docs", "n_occurrences")
    )


def init_report_table(spark: SparkSession, report_path: str) -> None:
    """Zero-row sentinel partition so the report table is readable
    from epoch zero (the ``init_pairs_table`` discipline)."""
    empty = spark.createDataFrame(
        [],
        "digest STRING, chunk STRING, n_tokens LONG, n_docs LONG,"
        " n_occurrences LONG, first_doc_id LONG, first_doc_id_history LONG",
    ).repartition(1)
    empty.write.mode("ignore").parquet(report_path.rstrip("/") + "/batch=-2")


def run_chunk_dedup_job(
    docs: DataFrame,
    store_path: str,
    report_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the chunk-dedup-against-history job over a streaming
    documents DataFrame (doc_id LONG, text STRING).  The store must
    exist (``init_chunk_store`` — its meta pins window/buckets/bloom so
    the stream can never drift); the meta is read once here.  Each
    epoch's duplicate report lands under ``batch=epoch`` of the report
    table (replay rewrites it — same idempotence as the store).

    ``compact_every=N`` folds committed epochs (``<= epoch-1``) into
    the base generation every N epochs; the current epoch is never
    folded, so crash-replay stays idempotent (the lsh-maintenance
    discipline)."""
    spark = docs.sparkSession
    meta = read_chunk_meta(spark, store_path)
    init_report_table(spark, report_path)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = update_chunk_store(
            batch_df, store_path, epoch_id, meta=meta
        )
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
            compact_chunk_store(spark, store_path, epoch_id - 1, meta=meta)
        (
            report.withColumn("batch", F.lit(int(epoch_id)))
            .coalesce(1)  # report increments are tiny
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(report_path)
        )

    return (
        docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


# -- compaction ------------------------------------------------------------
#
# Without compaction the store grows one (bucket, batch) partition set per
# epoch forever.  Folding count-bearing rows is harder than the LSH
# store's fold: lsh tolerates a crash mid-sweep because its probe
# DISTINCTs duplicate rows away, but SUMmed counts would double.  The
# commit protocol here makes the fold atomic instead:
#
# 1. the merged base is written under a NEW generation partition
#    (batch = -10, -11, ... — never the live base's partition);
# 2. the marker file ``_compaction`` ("base_batch folded_upto") is
#    committed with os.replace — the single atomic commit point (the
#    sketch_rollup version-swap discipline; local-FS semantics, like
#    every marker in this package);
# 3. superseded partitions (old base, folded epochs, orphaned
#    generations from earlier crashes) are deleted through the Hadoop FS
#    API — pure cleanup; readers already ignore them.
#
# Readers resolve the marker and keep ``batch == base_batch OR batch >
# folded_upto``: a crash before step 2 leaves the new generation
# invisible (retry rewrites it); a crash after step 2 leaves orphans the
# next sweep removes.  Single-writer per store — the standing
# one-lineage contract.

_COMPACTION = "/_compaction"


def _compaction_state(store_path: str) -> tuple[int | None, int]:
    """(base_batch, folded_upto) from the marker; (None, -1) before the
    first compaction (no base generation, every epoch live)."""
    marker = store_path + _COMPACTION
    if not os.path.exists(marker):
        return None, -1
    with open(marker) as fh:
        parts = fh.read().split()
    return int(parts[0]), int(parts[1])


def _current_rows(spark: SparkSession, store_path: str) -> DataFrame:
    """The store's LIVE rows: the current base generation (if any) plus
    every epoch newer than the folded watermark."""
    base_batch, folded = _compaction_state(store_path)
    store = _read_store(spark, store_path)
    cond = F.col("batch") > folded
    if base_batch is not None:
        cond = cond | (F.col("batch") == base_batch)
    return store.where(cond)


def compact_chunk_store(
    spark: SparkSession,
    store_path: str,
    upto_batch: int,
    meta: dict | None = None,
    rebuild_bloom_m_bits: int | None = None,
) -> int:
    """Fold the live epochs ``<= upto_batch`` (plus the previous base)
    into one new base generation.  Returns the number of epoch
    partitionsets folded (0 when there is nothing to fold).  The served
    report is unchanged by construction: the fold aggregates exactly the
    rows the reader would have summed.

    ``rebuild_bloom_m_bits`` recarves the Bloom fast path at a new
    capacity while the fold has every digest in hand anyway (the fixed
    filter saturates as the store grows — see init_chunk_store).  The
    rebuilt filter is exact over all live digests (zero accumulated
    false-positive debt) and commits via a NEW generation dir + meta
    update, so probes never see an m_bits/word-layout mismatch; it is a
    DIRECT-API maintenance operation — a running ``run_chunk_dedup_job``
    pinned the old meta at start, so rebuild between jobs, not under
    one."""
    from ..functions.fsops import list_partition_values

    if meta is None:
        meta = read_chunk_meta(spark, store_path)
    base_batch, folded = _compaction_state(store_path)
    live = _current_rows(spark, store_path)
    # which epoch partitions are live is a layout + marker question —
    # answered from the directory names and the marker, with the same
    # liveness condition _current_rows applies, instead of TWO
    # select-distinct scan jobs per fold (r14, see list_partition_values)
    all_batches = list_partition_values(
        spark, store_path + "/bucket=*/batch=*", "batch"
    )
    live_batches = [
        b for b in all_batches
        if b > folded or (base_batch is not None and b == base_batch)
    ]
    epochs = [b for b in live_batches if b >= 0 and b <= upto_batch]
    if not epochs:
        if rebuild_bloom_m_bits is not None:
            _rebuild_bloom(spark, store_path, meta, rebuild_bloom_m_bits)
        return 0
    fold_cond = (F.col("batch") >= 0) & (F.col("batch") <= int(upto_batch))
    if base_batch is not None:
        fold_cond = fold_cond | (F.col("batch") == base_batch)
    new_base = (base_batch - 1) if base_batch is not None else -10
    merged = (
        live.where(fold_cond)
        .groupBy("digest")
        .agg(
            F.min("chunk").alias("chunk"),
            F.min("n_tokens").alias("n_tokens"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
            F.min("first_doc_id").alias("first_doc_id"),
        )
        .withColumn("bucket", F.crc32(F.col("digest")) % meta["n_buckets"])
        .withColumn("batch", F.lit(int(new_base)))
        .repartition(meta["n_buckets"], "bucket")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket", "batch")
        .parquet(store_path)
    )
    # THE commit point: readers atomically switch to the new generation
    tmp = store_path + _COMPACTION + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{new_base} {int(upto_batch)}")
    os.replace(tmp, store_path + _COMPACTION)
    # cleanup (pure): retire everything that is neither the new base nor
    # newer than the watermark — folded epochs, the old base, and any
    # orphaned generations an earlier crash left behind
    from ..functions.fsops import delete_matching_dirs

    stale = [
        b
        for b in list_partition_values(
            spark, store_path + "/bucket=*/batch=*", "batch"
        )
        if b != new_base          # keep the new base
        and b <= int(upto_batch)  # keep unfolded epochs
        and b != -2               # keep the init sentinel
    ]
    for b in stale:
        delete_matching_dirs(spark, store_path + f"/bucket=*/batch={b}")
    if rebuild_bloom_m_bits is not None:
        _rebuild_bloom(spark, store_path, meta, rebuild_bloom_m_bits)
    return len(epochs)


def _rebuild_bloom(
    spark: SparkSession, store_path: str, meta: dict, m_bits: int
) -> None:
    """Recarve the Bloom fast path at ``m_bits`` from ALL live digests.

    Commit protocol (the meta is the switch): (1) build the new filter
    under a NEW generation dir — the live probe path never reads it;
    (2) rewrite the meta with the new ``m_bits``/``bloom_gen`` — the
    single commit point, after which every probe reads the matching
    (layout, words) pair; (3) delete the superseded generation dir
    (pure cleanup).  A crash before (2) orphans the new dir (the next
    rebuild's _swap_in picks an unused version suffix, and cleanup here
    removes it when its generation is superseded); a crash during the
    meta rewrite fails readers LOUDLY (missing meta), never silently
    probes a mismatched layout."""
    from ..functions.fsops import delete_matching_dirs
    from ..functions.sketches import bloom_words
    from .sketch_rollup import _swap_in

    old_dir = _bloom_dir(meta)
    new_meta = dict(meta)
    new_meta["m_bits"] = int(m_bits)
    new_meta["bloom_gen"] = meta.get("bloom_gen", 0) + 1
    digests = _current_rows(spark, store_path).select("digest")
    words = bloom_words(
        digests, F.col("digest"), m_bits=int(m_bits), k=meta["k"]
    ).localCheckpoint()
    _swap_in(words, store_path + _bloom_dir(new_meta), 0)
    _write_meta(spark, store_path, new_meta)
    meta.clear()
    meta.update(new_meta)  # caller-held meta stays usable
    if old_dir != _bloom_dir(new_meta):
        delete_matching_dirs(spark, store_path + old_dir)
