"""Streaming CDC snapshot maintenance: change batches folded across
micro-batches must equal the batch fold of the same changes in order,
the snapshot must stay readable mid-stream, and a replayed epoch must be
fenced (CDC inserts are not replay-idempotent — module doc)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.streaming.cdc_job import (
    cdc_snapshot_writer,
    read_snapshot,
)

SCHEMA_CH = "op STRING, k LONG, v STRING"
SCHEMA_SNAP = "k LONG, v STRING"


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_streamed_changes_equal_sequential_fold(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "snap"
    batch1 = [{"op": "I", "k": i, "v": f"v{i}"} for i in range(5)]
    batch2 = [
        {"op": "D", "k": 0, "v": None},
        {"op": "U", "k": 1, "v": "v1-new"},
        {"op": "I", "k": 10, "v": "v10"},
    ]
    _write(src, "a.jsonl", batch1)
    time.sleep(0.01)
    _write(src, "b.jsonl", batch2)

    stream = (
        spark.readStream.schema(SCHEMA_CH)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            cdc_snapshot_writer(str(table), ["k"], SCHEMA_SNAP)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    snap = {
        r["k"]: r["v"]
        for r in read_snapshot(spark, str(table), SCHEMA_SNAP).collect()
    }
    assert snap == {1: "v1-new", 2: "v2", 3: "v3", 4: "v4", 10: "v10"}


def test_replayed_epoch_is_fenced(spark, tmp_path):
    """Manually re-invoking the writer with an already-merged batch id
    must be a no-op — a committed INSERT replayed without the fence
    would duplicate its row."""
    table = tmp_path / "snap"
    writer = cdc_snapshot_writer(str(table), ["k"], SCHEMA_SNAP)
    b0 = spark.createDataFrame([("I", 1, "one")], SCHEMA_CH)
    writer(b0, 0)
    before = read_snapshot(spark, str(table), SCHEMA_SNAP).collect()
    writer(b0, 0)  # replay of the SAME epoch
    after = read_snapshot(spark, str(table), SCHEMA_SNAP).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert len(after) == 1
    # and the next epoch still applies
    writer(spark.createDataFrame([("U", 1, "uno")], SCHEMA_CH), 1)
    final = {
        r["k"]: r["v"]
        for r in read_snapshot(spark, str(table), SCHEMA_SNAP).collect()
    }
    assert final == {1: "uno"}


def test_snapshot_readable_between_batches(spark, tmp_path):
    table = tmp_path / "snap"
    writer = cdc_snapshot_writer(str(table), ["k"], SCHEMA_SNAP)
    writer(spark.createDataFrame([("I", 1, "a"), ("I", 2, "b")], SCHEMA_CH), 0)
    mid = read_snapshot(spark, str(table), SCHEMA_SNAP)
    assert mid.count() == 2
    writer(spark.createDataFrame([("D", 2, None)], SCHEMA_CH), 1)
    assert {
        r["k"] for r in read_snapshot(spark, str(table), SCHEMA_SNAP).collect()
    } == {1}
