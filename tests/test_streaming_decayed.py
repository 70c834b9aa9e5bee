"""Streaming decayed-feature rollup: batch/stream parity, replay
fencing, and serve-time re-decay.

The contract under test: partials decayed to a FIXED reference instant
merge by exact BIGINT addition, so the maintained table equals the
batch operator (``functions/windows.decayed_counts_at``) over every row
ever streamed — bit for bit, because both sides call the same algebra
function.  The driver-gated query ``decayed_rollup_counts`` pins the
same invariant against the DuckDB one-shot SQL.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions.windows import (
    decayed_counts_at,
)
from flink_invoice_processor_spark.streaming.decayed_rollup import (
    decayed_asof,
    decayed_rollup_writer,
    read_decayed_table,
)

REF = "2024-02-01 00:00:00"
SCHEMA = (
    "event_id: long, ts: timestamp_ntz, event_type: string, value: double"
)


@pytest.fixture()
def events(spark):
    rows = [
        (i, datetime(2024, 1, 1 + i % 28, i % 24, (7 * i) % 60, i % 60,
                     (i * 137) % 1_000_000),
         ["click", "view", "purchase"][i % 3],
         float(i % 50) + 0.25)
        for i in range(300)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _table_rows(spark, path):
    return {
        r.key: (r.n_events, r.wsum6, r.decayed_value6)
        for r in read_decayed_table(spark, path).collect()
    }


def _batch_rows(df):
    out = decayed_counts_at(
        df.select(
            F.col("event_type").alias("key"), "ts", "value"
        ),
        REF, key_col="key", half_life_s=604800,
    )
    return {
        r.key: (r.n_events, r.wsum6, r.decayed_value6)
        for r in out.collect()
    }


def test_stream_equals_batch_bit_for_bit(spark, events, tmp_path):
    path = str(tmp_path / "decayed")
    writer = decayed_rollup_writer(
        F.col("event_type"), REF, path, half_life_s=604800
    )
    # three uneven micro-batches, one of them empty for a key
    writer(events.where("event_id % 3 = 0"), 0)
    writer(events.where("event_id % 3 = 1"), 1)
    writer(events.where("event_id % 3 = 2"), 2)
    assert _table_rows(spark, path) == _batch_rows(events)


def test_any_split_same_table(spark, events, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    wa = decayed_rollup_writer(F.col("event_type"), REF, a)
    wb = decayed_rollup_writer(F.col("event_type"), REF, b)
    wa(events.where("event_id < 77"), 0)
    wa(events.where("event_id >= 77"), 1)
    wb(events.where("event_id % 2 = 0"), 0)
    wb(events.where("event_id % 2 = 1"), 1)
    assert _table_rows(spark, a) == _table_rows(spark, b)


def test_replayed_batch_is_fenced(spark, events, tmp_path):
    path = str(tmp_path / "decayed")
    writer = decayed_rollup_writer(F.col("event_type"), REF, path)
    half = events.where("event_id < 150")
    writer(half, 0)
    before = _table_rows(spark, path)
    writer(half, 0)  # at-least-once replay of the same epoch
    assert _table_rows(spark, path) == before
    writer(events.where("event_id >= 150"), 1)
    assert _table_rows(spark, path) == _batch_rows(events)


def test_empty_batch_keeps_table(spark, events, tmp_path):
    path = str(tmp_path / "decayed")
    writer = decayed_rollup_writer(F.col("event_type"), REF, path)
    writer(events, 0)
    before = _table_rows(spark, path)
    writer(events.where("event_id < 0"), 1)
    assert _table_rows(spark, path) == before


def test_decayed_asof_scaling(spark, events, tmp_path):
    path = str(tmp_path / "decayed")
    writer = decayed_rollup_writer(F.col("event_type"), REF, path)
    writer(events, 0)
    table = read_decayed_table(spark, path)
    # at the reference instant the factor is exactly 1.0
    same = {
        r.key: (r.wsum6, r.decayed_value6)
        for r in decayed_asof(table, REF, REF).collect()
    }
    assert same == {
        r.key: (r.wsum6, r.decayed_value6) for r in table.collect()
    }
    # one half-life later every stored sum halves (up to the single
    # documented edge rounding)
    later = {
        r.key: (r.wsum6, r.decayed_value6)
        for r in decayed_asof(
            table, "2024-02-08 00:00:00", REF, half_life_s=604800
        ).collect()
    }
    for k, (w6, v6) in same.items():
        assert abs(later[k][0] - round(w6 / 2)) <= 1
        assert abs(later[k][1] - round(v6 / 2)) <= 1
