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
