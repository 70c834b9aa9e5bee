"""Strict count-or-timeout batcher (K2): count-cap, timeout, and cross-batch
buffering over a real file-source streaming query.

Reference semantics under test: buffer-until-100 flush
(``InvoiceResponseBatchProcessor.java:130``), timeout drain (``:159-183``),
state carried across micro-batches.

Queries with registered processing-time timers do not terminate under
``availableNow`` (the pending timer keeps batches scheduled), so every test
polls the memory sink for the expected flushes and then stops the query."""

from __future__ import annotations

import json
import time

from flink_invoice_processor_spark.streaming.batcher import (
    FLUSH_COUNT,
    FLUSH_TIMEOUT,
    count_or_timeout_batches,
)


def _write_input(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    name = f"in-{time.time_ns()}.jsonl"
    (path / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_until(spark, tmp_path, batches, table, cond, timeout_s=60):
    q = (
        batches.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{table}"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        rows = spark.table(table).collect()
        while time.time() < deadline and not cond(rows):
            time.sleep(0.5)
            rows = spark.table(table).collect()
    finally:
        q.stop()
    return rows


def _stream(spark, src_dir, **opts):
    r = spark.readStream.schema("api_type INT, payload STRING")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.json(str(src_dir))


def test_count_flush_exact_batches(spark, tmp_path):
    """250 rows on one key, 30 on another → two full count-batches of 100;
    remainders stay buffered while the (10-minute) timer is pending."""
    src = tmp_path / "in"
    _write_input(
        src,
        [{"api_type": 10, "payload": f"p{i}"} for i in range(250)]
        + [{"api_type": 11, "payload": f"q{i}"} for i in range(30)],
    )
    batches = count_or_timeout_batches(
        _stream(spark, src), ["api_type"], batch_size=100,
        timeout_ms=600_000, max_wait_ms=None,
    )
    rows = _run_until(
        spark, tmp_path, batches, "k2_count", lambda rs: len(rs) >= 2
    )
    assert sorted({r.key for r in rows}) == ["10"]  # key 11 still buffered
    flushes = sorted(rows, key=lambda r: r.batch_seq)
    assert [r.item_count for r in flushes] == [100, 100]
    assert {r.flush_reason for r in flushes} == {FLUSH_COUNT}
    seen = [p for r in flushes for p in r.payloads]
    assert len(seen) == len(set(seen)) == 200
    assert set(seen) <= {f"p{i}" for i in range(250)}


def test_timeout_flush_drains_buffer(spark, tmp_path):
    """A sub-batch-size buffer must drain when the processing-time timer
    fires, without any new input arriving."""
    src = tmp_path / "in"
    _write_input(src, [{"api_type": 12, "payload": f"t{i}"} for i in range(7)])
    batches = count_or_timeout_batches(
        _stream(spark, src), ["api_type"], batch_size=100,
        timeout_ms=500, max_wait_ms=None,
    )
    rows = _run_until(
        spark, tmp_path, batches, "k2_timeout", lambda rs: len(rs) >= 1
    )
    assert len(rows) == 1
    (r,) = rows
    assert (r.key, r.item_count, r.flush_reason) == ("12", 7, FLUSH_TIMEOUT)
    assert sorted(r.payloads) == sorted(f"t{i}" for i in range(7))


def test_max_wait_force_flush(spark, tmp_path):
    """When a record arrives ≥ max_wait after the last flush, the whole
    buffer drains immediately (InvoiceResponseBatchProcessor.java:229-248),
    even though neither the count cap nor the timer is reached."""
    src = tmp_path / "in"
    _write_input(src, [{"api_type": 14, "payload": f"f{i}"} for i in range(5)])
    batches = count_or_timeout_batches(
        _stream(spark, src, maxFilesPerTrigger=1), ["api_type"],
        batch_size=100, timeout_ms=600_000, max_wait_ms=1000,
    )
    q = (
        batches.writeStream.format("memory")
        .queryName("k2_force")
        .option("checkpointLocation", str(tmp_path / "ckpt-k2_force"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        time.sleep(2.0)  # > max_wait since the first batch was buffered
        _write_input(src, [{"api_type": 14, "payload": f"g{i}"} for i in range(5)])
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline and not rows:
            time.sleep(0.5)
            rows = spark.table("k2_force").collect()
    finally:
        q.stop()
    assert [(r.item_count, r.flush_reason) for r in rows] == [(10, "force")]
    assert {p[0] for p in rows[0].payloads} == {"f", "g"}


def test_buffer_carries_across_micro_batches(spark, tmp_path):
    """60 rows then 60 rows with maxFilesPerTrigger=1: the second micro-batch
    completes the first count-flush of 100, leaving 20 buffered."""
    src = tmp_path / "in"
    _write_input(src, [{"api_type": 13, "payload": f"a{i}"} for i in range(60)])
    time.sleep(0.01)
    _write_input(src, [{"api_type": 13, "payload": f"b{i}"} for i in range(60)])
    batches = count_or_timeout_batches(
        _stream(spark, src, maxFilesPerTrigger=1), ["api_type"],
        batch_size=100, timeout_ms=600_000, max_wait_ms=None,
    )
    rows = _run_until(
        spark, tmp_path, batches, "k2_carry", lambda rs: len(rs) >= 1
    )
    assert [(r.item_count, r.flush_reason) for r in rows] == [(100, FLUSH_COUNT)]
    # the flush must span both files — proof the buffer crossed micro-batches
    prefixes = {p[0] for p in rows[0].payloads}
    assert prefixes == {"a", "b"}
