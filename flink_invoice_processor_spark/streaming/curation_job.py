"""Streaming training-data curation: the batch curation operators wired
into ONE continuous Structured Streaming pipeline —

    file/queue source → quality + language gate (pure maps — stream-safe
    as-is) → exact-dedup within the watermark horizon → context-window
    chunking → append sink

This is how a 100 TB-scale ingest actually runs: documents arrive
continuously, the map-only feature gates execute per micro-batch at scan
speed, dedup state is watermark-bounded (``dropDuplicatesWithinWatermark``
on the normalized-content hash — the same fix applied to the reference's
leaking dedup set, SURVEY §2.4 K3), and chunks append to partitioned
parquet that training jobs read incrementally.

Batch/stream parity: every transformation here is the SAME code path the
batch queries use (``quality_columns`` / ``language_columns`` /
``normalize_text`` / ``chunk_documents``), so a row admitted by the
streaming job is exactly the row the batch pipeline would admit —
pinned by ``tests/test_streaming_curation.py`` comparing the two.

Two gate variants:

- :func:`run_curation_job` — the STATIC gate (fixed classifier cut +
  language filter), fully stream-native: pure maps + watermark-bounded
  dedup, chunks append continuously.
- :func:`run_adaptive_curation_job` — the CALIBRATED gate
  (``adaptive_quality_cut``'s per-source exact percentile): the stream
  maintains two model-sized tables (scored docs + the (source, score6)
  histogram rollup) and the gated corpus is a VIEW over them
  (:func:`adaptive_survivors`), re-evaluated under the current
  threshold — a percentile gate is corpus-dependent, so per-batch hard
  admission would grandfather early documents past a cut that later
  data tightened; serving the gate as a view is what makes the stream
  equal the batch operator bit for bit at every epoch boundary (the
  histogram and scored-table writes are two separate commits, so a read
  landing between them inside one micro-batch may pair the new
  threshold with the old scored table — the crash-replay convergence
  note on :func:`adaptive_curation_micro_batch` covers why the next
  epoch heals it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.curation import chunk_documents
from ..functions.dedup import normalize_text
from ..functions.text import language_columns, quality_columns

#: Input contract for the streaming source.
DOC_SCHEMA = "doc_id LONG, text STRING, event_time TIMESTAMP"


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.63,
    langs: tuple[str, ...] = ("en",),
    dedup_delay: str = "10 minutes",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Apply the curation gates to a streaming documents DataFrame and
    return the stream of training chunks.

    All gates are stateless column maps except dedup, whose state is
    bounded by ``dedup_delay`` past the watermark.  The dedup key is the
    normalized-content md5 — identical text arriving twice within the
    horizon emits one chunk set."""
    feats = docs.select(
        "doc_id",
        "text",
        "event_time",
        *quality_columns(),
        *language_columns(),
        F.md5(normalize_text(F.col("text"))).alias("content_md5"),
    )
    kept = feats.where(
        (F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs)
    )
    deduped = kept.withWatermark("event_time", dedup_delay).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )
    return chunk_documents(
        deduped.select("doc_id", "text"), chunk_size=chunk_size, stride=stride
    )


def init_scored_table(spark, scored_path: str) -> None:
    """Make the scored-docs table readable from epoch zero: a zero-row
    schema-bearing ``batch=-2`` sentinel partition (mode ``ignore`` — a
    restart never touches an existing table), same fix as
    ``lsh_maintenance.init_pairs_table``.  Without it,
    :func:`adaptive_survivors` / :func:`calibrated_scores` die on
    path-not-found until the first non-empty micro-batch lands —
    contradicting the 'view over maintained state at every point in
    time' contract."""
    empty = spark.createDataFrame(
        [], "source string, doc_id long, score6 long"
    ).repartition(1)
    empty.write.mode("ignore").parquet(scored_path.rstrip("/") + "/batch=-2")


def adaptive_curation_micro_batch(
    batch_df: DataFrame,
    epoch_id: int,
    scored_path: str,
    hist_path: str,
) -> None:
    """One ingest increment of the ADAPTIVE gate's state: score the batch
    once (``classifier_score6`` — the batch operators' own scoring), fold
    the scores into the maintained (source, score6) histogram (batch-id
    fenced), and land the scored rows under their own ``batch=epoch``
    partition (replay rewrites identical content).  Crash between the two
    writes is safe in either order: the histogram fence skips a replayed
    epoch, the scored partition rewrite is idempotent."""
    from ..functions.curation import classifier_score6
    from .sketch_rollup import histogram_rollup_writer

    if batch_df.isEmpty():
        return
    scored = classifier_score6(batch_df).localCheckpoint()
    histogram_rollup_writer(F.col("source"), F.col("score6"), hist_path)(
        scored, epoch_id
    )
    (
        scored.withColumn("batch", F.lit(int(epoch_id)))
        .coalesce(1)  # score rows are tiny; one file per epoch
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(scored_path)
    )


def adaptive_survivors(
    spark, scored_path: str, hist_path: str, pct: int = 75
) -> DataFrame:
    """The calibrated adaptive gate SERVED from maintained state: per-
    source thresholds rank-selected from the histogram rollup
    (``functions/curation.threshold_from_histogram`` — the batch gate's
    own selection) against the stored scored-docs table.  No corpus
    re-scan, no re-scoring: two model-sized reads + one broadcast join.

    Because score and threshold algebra are THE batch operator's
    functions and histogram merge is exact, this equals
    ``adaptive_quality_cut`` over everything ingested so far, bit for
    bit, AT EPOCH BOUNDARIES — the histogram and scored-table writes
    are not one atomic commit, so a read racing a micro-batch between
    them can transiently see a threshold that includes documents absent
    from the scored table; the next completed epoch restores exact
    equality — unlike a hard per-batch gate, admission is re-evaluated under
    the current threshold, so early documents are never grandfathered
    past a cut that later data tightened (pinned in
    ``tests/test_streaming_curation.py``)."""
    from ..functions.curation import (
        apply_quality_gate,
        threshold_from_histogram,
    )
    from .sketch_rollup import read_histogram_table

    hist = read_histogram_table(spark, hist_path).select(
        F.col("k").alias("source"), "val", "cnt"
    )
    thr = threshold_from_histogram(hist, pct=pct)
    scored = spark.read.parquet(scored_path).select(
        "source", "doc_id", "score6"
    )
    return apply_quality_gate(scored, thr)


def calibrated_scores(
    spark, scored_path: str, hist_path: str, pct_scale: int = 1_000_000
) -> DataFrame:
    """Cross-source quantile CALIBRATION served from the same maintained
    state as :func:`adaptive_survivors`: each stored document's score
    replaced by its exact within-source quantile, the lookup derived
    from the histogram rollup by the batch normalizer's own algebra
    (``functions/curation.quantile_lookup_from_histogram``) — equals
    ``quantile_normalize_scores`` over everything ingested, bit for
    bit.  Output: (source, doc_id, score6, q6)."""
    from ..functions.curation import (
        apply_quantile_lookup,
        quantile_lookup_from_histogram,
    )
    from .sketch_rollup import read_histogram_table

    hist = read_histogram_table(spark, hist_path).select(
        F.col("k").alias("source"), "val", "cnt"
    )
    lookup = quantile_lookup_from_histogram(hist, pct_scale=pct_scale)
    scored = spark.read.parquet(scored_path).select(
        "source", "doc_id", "score6"
    )
    return apply_quantile_lookup(scored, lookup)


def run_adaptive_curation_job(
    docs: DataFrame,
    scored_path: str,
    hist_path: str,
    checkpoint: str,
    trigger_seconds: int = 5,
) -> StreamingQuery:
    """Start the continuous ADAPTIVE curation job over a streaming
    documents DataFrame (doc_id LONG, text STRING, source STRING): the
    calibrated per-source percentile gate replaces the static classifier
    cut.  The stream maintains the two model-sized state tables; the
    gated corpus is a VIEW over them (:func:`adaptive_survivors`), so
    the served threshold always reflects every document ingested.  The
    scored table is initialized empty-but-readable before the stream
    starts (:func:`init_scored_table`), so the view works from epoch
    zero."""
    init_scored_table(docs.sparkSession, scored_path)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        adaptive_curation_micro_batch(
            batch_df, epoch_id, scored_path, hist_path
        )

    return (
        docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def run_curation_job(
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_seconds: int = 5,
    **gate_kwargs,
) -> StreamingQuery:
    """Start the continuous curation job: curated chunks append to
    parquet at ``out_path``.  Exactly-once to the file sink comes from the
    checkpoint + the file sink's transaction log; a restart from the same
    checkpoint neither drops nor re-emits chunks."""
    chunks = curate_stream(docs, **gate_kwargs)
    return (
        chunks.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
