"""Stream-stream interval join with watermarks on both sides.

The same ``interval_join`` that powers the batch
``events_purchase_click_window`` query runs unchanged on two streams: the
bounded time condition plus per-side watermarks lets Spark expire join
state, so the operator holds a sliding window of rows per key instead of
the whole history.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions.asof import interval_join


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    pdir, cdir = tmp_path / "purchases", tmp_path / "clicks"
    # one purchase; three clicks: in-window same user, too-early same user,
    # in-window other user — only the first must join
    _write(pdir, "p.jsonl", [
        {"event_id": 100, "user_id": 1, "ts": "2026-01-01T10:00:00"},
    ])
    _write(cdir, "c.jsonl", [
        {"click_id": 7, "c_user": 1, "c_ts": "2026-01-01T09:45:00"},
        {"click_id": 8, "c_user": 1, "c_ts": "2026-01-01T09:20:00"},
        {"click_id": 9, "c_user": 2, "c_ts": "2026-01-01T09:50:00"},
    ])

    purchases = (
        spark.readStream.schema("event_id LONG, user_id LONG, ts TIMESTAMP")
        .json(str(pdir))
        .withWatermark("ts", "10 minutes")
    )
    clicks = (
        spark.readStream.schema("click_id LONG, c_user LONG, c_ts TIMESTAMP")
        .json(str(cdir))
        .withWatermark("c_ts", "10 minutes")
    )
    joined = interval_join(
        purchases, clicks, [("user_id", "c_user")], "ts", "c_ts",
        lookback="30 MINUTES",
    ).select("event_id", "click_id")

    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not spark.table("ss_join").count():
            time.sleep(0.5)
        rows = {(r.event_id, r.click_id) for r in spark.table("ss_join").collect()}
        assert rows == {(100, 7)}
        time.sleep(2.0)  # a few extra triggers: no late/out-of-window leakage
        assert spark.table("ss_join").count() == 1
    finally:
        q.stop()


def test_interval_join_rejects_column_overlap(spark):
    df = spark.range(1).select(
        F.col("id"), F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts")
    )
    try:
        interval_join(df, df, [("id", "id")], "ts", "ts", lookback="1 HOUR")
        raise AssertionError("expected ValueError on overlapping columns")
    except ValueError as e:
        assert "disjoint" in str(e)
