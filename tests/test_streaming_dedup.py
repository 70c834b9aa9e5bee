"""Cross-micro-batch streaming dedup: a duplicate key arriving in a LATER
micro-batch must be dropped (the reference's dedup-set semantics, K3) with
state bounded by the watermark."""

from __future__ import annotations

import json
import time

from flink_invoice_processor_spark.streaming.dedup import streaming_dedup

SCHEMA = (
    "record_type STRING, id LONG, sid STRING, syncid STRING, "
    "created_date TIMESTAMP"
)


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_duplicate_across_micro_batches_dropped(spark, tmp_path):
    src = tmp_path / "in"
    base = {"record_type": "inv_in", "sid": "S", "syncid": "Y"}
    t = "2026-01-01T00:00:{:02d}"
    _write(src, "a.jsonl", [
        {**base, "id": 1, "created_date": t.format(1)},
        {**base, "id": 2, "created_date": t.format(2)},
    ])
    time.sleep(0.01)
    _write(src, "b.jsonl", [
        {**base, "id": 1, "created_date": t.format(3)},  # dup of id=1
        {**base, "id": 3, "created_date": t.format(4)},
    ])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = streaming_dedup(stream, delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sdedup").collect()
    assert sorted(r.id for r in rows) == [1, 2, 3]
