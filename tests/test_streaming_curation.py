"""Streaming curation job: batch/stream parity, in-stream dedup, and
append-sink delivery over a real file-source streaming query."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions.curation import chunk_documents
from flink_invoice_processor_spark.functions.text import (
    language_columns,
    quality_columns,
)
from flink_invoice_processor_spark.streaming.curation_job import (
    DOC_SCHEMA,
    run_curation_job,
)

# quality-passing English text (stopword ratio ~0.4, mid-length words)
GOOD = (
    "the quality of this document is good and the tokens are plain "
    "with a steady flow of the usual words that a filter would keep"
)
BAD = "x" * 400  # one degenerate token → quality floor


def _write_docs(src, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / f"d-{time.time_ns()}.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _docs(i, text):
    return {"doc_id": i, "text": text, "event_time": "2026-01-01 00:00:00"}


def _run(spark, tmp_path, rows, expect, timeout_s=90):
    src = tmp_path / "in"
    out = tmp_path / "out"
    _write_docs(src, rows)
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    q = run_curation_job(
        stream, str(out), str(tmp_path / "ckpt"), trigger_seconds=1
    )
    try:
        deadline = time.time() + timeout_s
        n = -1
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(out)).count()
            except Exception:
                n = -1
            if n >= expect:
                break
            time.sleep(1)
    finally:
        q.stop()
    return spark.read.parquet(str(out))


def test_streaming_matches_batch_curation(spark, tmp_path):
    rows = [_docs(1, GOOD), _docs(2, BAD), _docs(3, GOOD + " extended slightly")]
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    feats = batch.select("doc_id", "text", *quality_columns(), *language_columns())
    kept = feats.where((F.col("quality") >= 0.63) & (F.col("pred_lang") == "en"))
    expected = sorted(
        map(tuple, chunk_documents(kept.select("doc_id", "text")).collect())
    )
    assert expected, "fixture must pass the gates in batch"

    got = _run(spark, tmp_path, rows, expect=len(expected))
    assert sorted(map(tuple, got.collect())) == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # same content under two doc_ids → one survives the content-md5 dedup
    rows = [_docs(10, GOOD), _docs(11, GOOD)]
    got = _run(spark, tmp_path, rows, expect=1)
    assert {r["doc_id"] for r in got.collect()} in ({10}, {11})
    # exactly one doc's chunks, not a mix
    one_doc_chunks = chunk_documents(
        spark.createDataFrame([(10, GOOD)], "doc_id long, text string")
    ).count()
    assert got.count() == one_doc_chunks


def test_streaming_curation_restart_no_dupes_no_loss(spark, tmp_path):
    """Stop the job, add more input, restart from the SAME checkpoint:
    earlier chunks are not re-emitted, new ones appear exactly once."""
    from flink_invoice_processor_spark.streaming.curation_job import (
        run_curation_job as run,
    )

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_docs(src, [_docs(1, GOOD)])
    stream = lambda: spark.readStream.schema(DOC_SCHEMA).json(str(src))  # noqa: E731
    q = run(stream(), str(out), str(ckpt), trigger_seconds=1)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not _count(spark, out):
            time.sleep(1)
    finally:
        q.stop()
    first = _count(spark, out)
    assert first > 0

    _write_docs(src, [_docs(2, GOOD + " with different content appended")])
    q2 = run(stream(), str(out), str(ckpt), trigger_seconds=1)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and _count(spark, out) <= first:
            time.sleep(1)
    finally:
        q2.stop()
    rows = spark.read.parquet(str(out)).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_id"])
    # no duplicated chunk ids per doc (exactly-once to the file sink)
    for doc, chunks in per_doc.items():
        assert len(chunks) == len(set(chunks)), (doc, chunks)
    assert set(per_doc) == {1, 2}


def _count(spark, out):
    try:
        return spark.read.parquet(str(out)).count()
    except Exception:
        return 0
