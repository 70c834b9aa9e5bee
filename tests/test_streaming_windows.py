"""Streaming windowed aggregation with watermarks: windows finalize in
append mode once the watermark passes, and data later than the watermark
delay is dropped from finalized windows (the late-data contract the
reference never had — it ran processing-time timers only)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_watermarked_tumbling_window_drops_late_data(spark, tmp_path):
    src = tmp_path / "in"
    # two events in the 10:00 window + one at 11:30 that pushes the
    # watermark (11:20) past the window end, finalizing it
    _write(src, "a.jsonl", [
        {"user_id": 1, "ts": "2026-01-01T10:00:10", "event_type": "click"},
        {"user_id": 2, "ts": "2026-01-01T10:10:00", "event_type": "click"},
        {"user_id": 3, "ts": "2026-01-01T11:30:00", "event_type": "click"},
    ])
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, event_type STRING")
        .json(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        def table():
            return {
                str(r.window_start): r.n
                for r in spark.table("wm_windows").collect()
            }

        deadline = time.time() + 60
        while time.time() < deadline and "2026-01-01 10:00:00" not in table():
            time.sleep(0.5)
        assert table() == {"2026-01-01 10:00:00": 2}

        # a LATE event for the finalized window + one fresh event; the late
        # one must be dropped — the window is never re-emitted or updated
        _write(src, "b.jsonl", [
            {"user_id": 4, "ts": "2026-01-01T10:05:00", "event_type": "click"},
            {"user_id": 5, "ts": "2026-01-01T11:40:00", "event_type": "click"},
        ])
        time.sleep(3.0)  # several triggers worth of settling time
        assert table() == {"2026-01-01 10:00:00": 2}
    finally:
        q.stop()


def test_watermarked_session_window_merges_and_finalizes(spark, tmp_path):
    """`session_counts` (native session_window) in append-mode streaming:
    events within the gap merge into one session, which only emits once the
    watermark passes its end."""
    from flink_invoice_processor_spark.functions.windows import session_counts

    src = tmp_path / "in"
    _write(src, "a.jsonl", [
        {"user_id": 1, "ts": "2026-01-01T10:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2026-01-01T10:03:00", "value": 1.0},
        {"user_id": 1, "ts": "2026-01-01T11:00:00", "value": 1.0},
    ])
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .json(str(src))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        session_counts(stream, gap="5 minutes")
        .writeStream.format("memory")
        .queryName("wm_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not spark.table("wm_sessions").count():
            time.sleep(0.5)
        rows = spark.table("wm_sessions").collect()
        # the 10:00+10:03 events merged (session 10:00-10:08, finalized by
        # the 11:00 event's watermark); the 11:00 session is still open
        assert [(str(r.session_start), str(r.session_end), r.user_id, r.n_events)
                for r in rows] == [
            ("2026-01-01 10:00:00", "2026-01-01 10:08:00", 1, 2)
        ]
    finally:
        q.stop()
