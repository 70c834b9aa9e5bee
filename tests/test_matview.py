"""Incremental materialized view: per-batch partition overwrite must
converge to the full batch aggregate, only touch affected partitions,
and stay correct across out-of-order arrivals for the same hour."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.streaming.matview import (
    run_hourly_matview_job,
    upsert_hourly_counts,
)

SCHEMA = "ts TIMESTAMP, event_type STRING, value DOUBLE"


def _ev(h, m, t, v):
    from datetime import datetime

    return (datetime(2026, 1, 1, h, m, 0), t, v)


def test_upsert_converges_to_batch_aggregate(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    b1 = spark.createDataFrame(
        [_ev(0, 5, "click", 1.0), _ev(0, 10, "view", 2.0), _ev(1, 0, "click", 3.0)],
        SCHEMA,
    )
    # late arrival for hour 0 in a LATER batch — its partition is rewritten
    b2 = spark.createDataFrame(
        [_ev(0, 50, "click", 5.0), _ev(2, 0, "view", 7.0)], SCHEMA
    )
    upsert_hourly_counts(spark, b1, base, view, epoch_id=1)
    upsert_hourly_counts(spark, b2, base, view, epoch_id=2)

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_1e4"])
        for r in spark.read.parquet(view).collect()
    }
    assert got[("2026-01-01-00", "click")] == (2, 60000)  # 1.0 + 5.0
    assert got[("2026-01-01-00", "view")] == (1, 20000)
    assert got[("2026-01-01-01", "click")] == (1, 30000)
    assert got[("2026-01-01-02", "view")] == (1, 70000)
    # equivalently: the view equals the one-shot aggregate over all data
    full = (
        spark.read.parquet(base)
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("s"),
        )
    )
    assert {
        (r["hour"], r["event_type"]): (r["n"], r["s"]) for r in full.collect()
    } == got


def test_upsert_only_rewrites_touched_partitions(spark, tmp_path):
    import glob
    import os

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    upsert_hourly_counts(
        spark, spark.createDataFrame([_ev(0, 1, "click", 1.0)], SCHEMA), base, view,
        epoch_id=1,
    )
    h0_files = set(glob.glob(os.path.join(view, "hour=2026-01-01-00", "*.parquet")))
    upsert_hourly_counts(
        spark, spark.createDataFrame([_ev(3, 1, "view", 1.0)], SCHEMA), base, view,
        epoch_id=2,
    )
    # untouched hour-0 partition files are byte-identical (not rewritten)
    assert set(
        glob.glob(os.path.join(view, "hour=2026-01-01-00", "*.parquet"))
    ) == h0_files
    assert glob.glob(os.path.join(view, "hour=2026-01-01-03", "*.parquet"))


def test_streaming_matview_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01 00:05:00", "event_type": "click", "value": 1.5},
        {"ts": "2026-01-01 00:06:00", "event_type": "click", "value": 2.5},
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = run_hourly_matview_job(
        stream,
        str(tmp_path / "base"),
        str(tmp_path / "view"),
        str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        got = []
        while time.time() < deadline and not got:
            time.sleep(1)
            try:
                got = spark.read.parquet(str(tmp_path / "view")).collect()
            except Exception:
                got = []
    finally:
        q.stop()
    (r,) = got
    assert (r["event_type"], r["n_events"], r["sum_value_1e4"]) == ("click", 2, 40000)


def test_upsert_replay_of_same_epoch_is_idempotent(spark, tmp_path):
    """Crash-replay: foreachBatch re-delivers an epoch whose base write
    already committed — the rewrite must not double-count the view.

    Pins the STRONG property (the cdc_chunk_store r12 discipline): the
    replay is a bit-exact no-op on BOTH tables — base rows AND view
    rows identical before/after — across a multi-hour, multi-epoch
    store with untouched history.  This test is the reason the gated
    query ``matview_hourly_served`` no longer re-runs the replay leg
    per pass (r13)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    b0 = spark.createDataFrame(
        [_ev(0, 5, "click", 1.0), _ev(1, 0, "view", 2.0)], SCHEMA
    )
    b1 = spark.createDataFrame(
        [_ev(1, 30, "click", 3.0), _ev(2, 0, "view", 4.0)], SCHEMA
    )
    upsert_hourly_counts(spark, b0, base, view, epoch_id=6)
    upsert_hourly_counts(spark, b1, base, view, epoch_id=7)

    def snap(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    base_once, view_once = snap(base), snap(view)
    upsert_hourly_counts(spark, b1, base, view, epoch_id=7)  # replay
    assert snap(base) == base_once
    assert snap(view) == view_once
