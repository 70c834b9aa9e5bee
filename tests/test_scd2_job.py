"""Incremental SCD2 maintenance: per-batch bucket overwrite must
converge to the batch ``scd2_history`` over all events, stay correct
under out-of-order arrivals, epoch replays, and cross-epoch duplicate
delivery, and never rewrite untouched buckets."""

from __future__ import annotations

import glob
import json
import os
import time
from datetime import datetime

from flink_invoice_processor_spark.functions.scd2 import scd2_history
from flink_invoice_processor_spark.streaming.scd2_job import (
    run_scd2_job,
    upsert_scd2,
)

SCHEMA = "user_id LONG, ts TIMESTAMP, event_type STRING"


def _ev(u, minute, t):
    return (u, datetime(2026, 1, 1, 0, minute, 0), t)


def _hist(spark, view):
    return {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in spark.read.parquet(view).collect()
    }


def _batch_hist(spark, rows):
    df = scd2_history(spark.createDataFrame(rows, SCHEMA))
    return {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in df.collect()
    }


def test_upserts_converge_to_batch_history(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    b1 = [_ev(1, 0, "view"), _ev(1, 10, "click"), _ev(2, 5, "view")]
    # batch 2: user 1 gets a LATE event (minute 5) that splits the
    # view->click transition, plus a no-op update (click at 20) that
    # must collapse; user 3 appears for the first time
    b2 = [_ev(1, 5, "purchase"), _ev(1, 20, "click"), _ev(3, 1, "view")]
    upsert_scd2(spark, spark.createDataFrame(b1, SCHEMA), base, view, 1, 8)
    upsert_scd2(spark, spark.createDataFrame(b2, SCHEMA), base, view, 2, 8)
    assert _hist(spark, view) == _batch_hist(spark, b1 + b2)
    # interval laws on the maintained table: exactly one open interval
    # per user, dense versions from 1
    got = _hist(spark, view)
    users = {u for (u, _) in got}
    for u in users:
        versions = sorted(v for (uu, v) in got if uu == u)
        assert versions == list(range(1, len(versions) + 1))
        assert sum(1 for (uu, v) in got if uu == u and got[(uu, v)][3]) == 1


def test_replay_of_same_epoch_is_idempotent(spark, tmp_path):
    """Pins the STRONG replay property (the cdc_chunk_store r12
    discipline): the crash-replay of an epoch is a bit-exact no-op on
    BOTH tables — base rows AND view history identical before/after —
    across a multi-bucket, multi-epoch store.  This test is the reason
    the gated query ``scd2_store_served`` no longer re-runs the replay
    leg per pass (r13)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    b0 = spark.createDataFrame([_ev(0, 0, "view"), _ev(2, 3, "view")], SCHEMA)
    b1 = spark.createDataFrame([_ev(1, 0, "view"), _ev(1, 9, "click")], SCHEMA)
    upsert_scd2(spark, b0, base, view, 6, 8)
    upsert_scd2(spark, b1, base, view, 7, 8)

    def snap(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    base_once, hist_once = snap(base), _hist(spark, view)
    upsert_scd2(spark, b1, base, view, 7, 8)  # crash-replay of epoch 7
    assert snap(base) == base_once
    assert _hist(spark, view) == hist_once


def test_cross_epoch_duplicate_delivery_collapses(spark, tmp_path):
    """The same observation redelivered in a DIFFERENT epoch survives
    the epoch fence (two base copies) — the recompute's exact-triple
    dedup must keep the history identical."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    rows = [_ev(1, 0, "view"), _ev(1, 10, "click")]
    upsert_scd2(spark, spark.createDataFrame(rows, SCHEMA), base, view, 1, 8)
    upsert_scd2(
        spark, spark.createDataFrame([_ev(1, 10, "click")], SCHEMA),
        base, view, 2, 8,
    )
    assert _hist(spark, view) == _batch_hist(spark, rows)


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    # users 0 and 1 land in different buckets under n_buckets=8
    upsert_scd2(
        spark, spark.createDataFrame([_ev(0, 0, "view")], SCHEMA),
        base, view, 1, 8,
    )
    u0_files = set(glob.glob(os.path.join(view, "ub=0", "*.parquet")))
    assert u0_files
    upsert_scd2(
        spark, spark.createDataFrame([_ev(1, 0, "click")], SCHEMA),
        base, view, 2, 8,
    )
    assert set(glob.glob(os.path.join(view, "ub=0", "*.parquet"))) == u0_files
    assert glob.glob(os.path.join(view, "ub=1", "*.parquet"))


def test_streaming_scd2_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"user_id": 1, "ts": "2026-01-01 00:00:00", "event_type": "view"},
        {"user_id": 1, "ts": "2026-01-01 00:05:00", "event_type": "click"},
        {"user_id": 1, "ts": "2026-01-01 00:07:00", "event_type": "click"},
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = run_scd2_job(
        stream,
        str(tmp_path / "base"),
        str(tmp_path / "view"),
        str(tmp_path / "ckpt"),
        trigger_seconds=1,
        n_buckets=8,
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline and len(got) < 2:
            time.sleep(1)
            try:
                got = _hist(spark, str(tmp_path / "view"))
            except Exception:
                got = {}
    finally:
        q.stop()
    # two versions: view [00:00, 00:05) then click open (no-op collapsed)
    assert got[(1, 1)][0] == "view" and got[(1, 1)][3] is False
    assert got[(1, 2)][0] == "click" and got[(1, 2)][2] is None
    assert got[(1, 2)][3] is True
