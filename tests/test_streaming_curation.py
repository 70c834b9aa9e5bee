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


class TestAdaptiveCurationJob:
    """The calibrated adaptive gate served from maintained state must
    equal the batch operator over everything ingested — in any split,
    and after replay."""

    ROWS = [
        (i, " ".join(f"w{j}{i % 5}" for j in range(i % 6 + 1)), f"s{i % 2}")
        for i in range(30)
    ]
    SCHEMA = "doc_id: long, text: string, source: string"

    def _batch_expected(self, spark):
        from flink_invoice_processor_spark.functions.curation import (
            adaptive_quality_cut,
        )

        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        return sorted(map(tuple, adaptive_quality_cut(docs).collect()))

    def test_survivors_equal_batch_operator_any_split(self, spark, tmp_path):
        from flink_invoice_processor_spark.streaming.curation_job import (
            adaptive_curation_micro_batch,
            adaptive_survivors,
        )

        scored = str(tmp_path / "scored")
        hist = str(tmp_path / "hist")
        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        # three uneven "micro-batches"
        for epoch, pred in enumerate(
            ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
        ):
            adaptive_curation_micro_batch(
                docs.where(pred), epoch, scored, hist
            )
        served = sorted(
            map(tuple, adaptive_survivors(spark, scored, hist).collect())
        )
        assert served == self._batch_expected(spark)

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        from flink_invoice_processor_spark.streaming.curation_job import (
            adaptive_curation_micro_batch,
            adaptive_survivors,
        )

        scored = str(tmp_path / "scored")
        hist = str(tmp_path / "hist")
        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        adaptive_curation_micro_batch(docs.where("doc_id < 15"), 0, scored, hist)
        adaptive_curation_micro_batch(docs.where("doc_id >= 15"), 1, scored, hist)
        # at-least-once replay of the last epoch
        adaptive_curation_micro_batch(docs.where("doc_id >= 15"), 1, scored, hist)
        served = sorted(
            map(tuple, adaptive_survivors(spark, scored, hist).collect())
        )
        assert served == self._batch_expected(spark)

    def test_threshold_tightens_retroactively(self, spark, tmp_path):
        """A document admitted under an early threshold is NOT
        grandfathered: the serve path re-evaluates under the current
        threshold, so survivors after more data equal the batch answer,
        not the union of per-batch gates."""
        from flink_invoice_processor_spark.functions.curation import (
            adaptive_quality_cut,
        )
        from flink_invoice_processor_spark.streaming.curation_job import (
            adaptive_curation_micro_batch,
            adaptive_survivors,
        )

        scored = str(tmp_path / "scored")
        hist = str(tmp_path / "hist")
        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        adaptive_curation_micro_batch(docs.where("doc_id < 10"), 0, scored, hist)
        first = {
            r.doc_id for r in adaptive_survivors(spark, scored, hist).collect()
        }
        # prefix parity: equals the batch operator run on the prefix
        prefix_expected = {
            r.doc_id
            for r in adaptive_quality_cut(docs.where("doc_id < 10")).collect()
        }
        assert first == prefix_expected
        adaptive_curation_micro_batch(docs.where("doc_id >= 10"), 1, scored, hist)
        served = sorted(
            map(tuple, adaptive_survivors(spark, scored, hist).collect())
        )
        assert served == self._batch_expected(spark)

    def test_streaming_job_end_to_end(self, spark, tmp_path):
        import json as _json
        import time as _time

        from flink_invoice_processor_spark.streaming.curation_job import (
            adaptive_survivors,
            run_adaptive_curation_job,
        )

        src = tmp_path / "in"
        src.mkdir(parents=True, exist_ok=True)
        (src / "d.jsonl").write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t, "source": s})
                for i, t, s in self.ROWS
            )
            + "\n"
        )
        stream = spark.readStream.schema(
            "doc_id LONG, text STRING, source STRING"
        ).json(str(src))
        scored = str(tmp_path / "scored")
        hist = str(tmp_path / "hist")
        q = run_adaptive_curation_job(
            stream, scored, hist, str(tmp_path / "ckpt"), trigger_seconds=1
        )
        try:
            expected = self._batch_expected(spark)
            deadline = _time.time() + 90
            served = None
            while _time.time() < deadline:
                try:
                    served = sorted(
                        map(
                            tuple,
                            adaptive_survivors(spark, scored, hist).collect(),
                        )
                    )
                except Exception:
                    served = None
                if served == expected:
                    break
                _time.sleep(1)
        finally:
            q.stop()
        assert served == expected

    def test_calibrated_scores_equal_batch_normalizer(self, spark, tmp_path):
        from flink_invoice_processor_spark.functions.curation import (
            quantile_normalize_scores,
        )
        from flink_invoice_processor_spark.streaming.curation_job import (
            adaptive_curation_micro_batch,
            calibrated_scores,
        )

        scored = str(tmp_path / "scored")
        hist = str(tmp_path / "hist")
        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        adaptive_curation_micro_batch(docs.where("doc_id % 2 = 0"), 0, scored, hist)
        adaptive_curation_micro_batch(docs.where("doc_id % 2 = 1"), 1, scored, hist)
        served = sorted(
            map(tuple, calibrated_scores(spark, scored, hist).collect())
        )
        expected = sorted(
            map(tuple, quantile_normalize_scores(docs).collect())
        )
        assert served == expected
