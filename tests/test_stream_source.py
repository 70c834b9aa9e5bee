"""Streaming table-queue source: offsets advance past polled ids, rows
arrive exactly once across micro-batches, and the ready-predicate filters
at the database (reference AsyncInvInSource semantics with the high-water
mark promoted into the Spark offset log)."""

from __future__ import annotations

import sqlite3
import time

from flink_invoice_processor_spark.sources.stream import TableQueueDataSource

from test_sinks_sources import DDL

INSERT = (
    "INSERT INTO async_inv_in (tax_schema, inv, api_type, res_type, state, sid, syncid)"
    " VALUES (?, '{}', 10, ?, ?, ?, ?)"
)


def _seed(path, n, start, res_type=2, state=4):
    conn = sqlite3.connect(path)
    conn.executemany(
        INSERT,
        [("T", res_type, state, f"S-{start + i}", f"Y-{start + i}") for i in range(n)],
    )
    conn.commit()
    conn.close()


def test_table_queue_stream_exactly_once(spark, tmp_path):
    db = str(tmp_path / "queue.db")
    conn = sqlite3.connect(db)
    for ddl in DDL:
        conn.execute(ddl)
    conn.commit()
    conn.close()

    _seed(db, 5, 0)                      # ready rows
    _seed(db, 3, 100, state=0)           # NOT ready (state=0) — must not appear

    spark.dataSource.register(TableQueueDataSource)
    stream = (
        spark.readStream.format("table_queue")
        .option("db_path", db)
        .option("table", "async_inv_in")
        .option("fetch_size", "3")       # smaller than the seed → multi-batch
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("queue_rows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline and len(rows) < 5:
            time.sleep(0.5)
            rows = spark.table("queue_rows").collect()
        assert sorted(r.sid for r in rows) == [f"S-{i}" for i in range(5)]

        # rows that become ready later are picked up by id > hwm polling
        _seed(db, 4, 200)
        deadline = time.time() + 60
        while time.time() < deadline and len(rows) < 9:
            time.sleep(0.5)
            rows = spark.table("queue_rows").collect()
    finally:
        q.stop()

    sids = [r.sid for r in rows]
    assert sorted(sids) == sorted(
        [f"S-{i}" for i in range(5)] + [f"S-{200 + i}" for i in range(4)]
    )
    assert len(sids) == len(set(sids)), "a row was emitted twice"
    # the not-ready rows never leaked through
    assert not set(sids) & {f"S-{100 + i}" for i in range(3)}


def test_offset_survives_restart(spark, tmp_path):
    """The id high-water mark lives in the checkpoint offset log, so a
    restarted query resumes past already-delivered rows — the durability
    upgrade over the reference's in-memory mark (AsyncInvInSource.java:35-49,
    commented out there)."""
    db = str(tmp_path / "queue.db")
    conn = sqlite3.connect(db)
    for ddl in DDL:
        conn.execute(ddl)
    conn.commit()
    conn.close()
    _seed(db, 5, 0)

    spark.dataSource.register(TableQueueDataSource)
    out_dir = str(tmp_path / "out")

    def read_sids():
        try:
            return [r.sid for r in spark.read.parquet(out_dir).collect()]
        except Exception:
            return []

    def run(expect):
        stream = (
            spark.readStream.format("table_queue")
            .option("db_path", db)
            .option("table", "async_inv_in")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt-restart"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and len(read_sids()) < expect:
                time.sleep(0.5)
        finally:
            q.stop()
        return read_sids()

    first = run(5)
    assert sorted(first) == [f"S-{i}" for i in range(5)]

    _seed(db, 3, 300)
    total = run(8)  # restart from the same checkpoint — no re-delivery
    assert sorted(total) == sorted([f"S-{i}" for i in range(5)] + [f"S-{300 + i}" for i in range(3)])
    assert len(total) == len(set(total)), "restart re-delivered rows"


def test_crash_mid_epoch_replays_uncommitted_range_exactly(spark, tmp_path):
    """CRASH-restart recovery (not the graceful stop above): the sink
    writes its rows and then dies BEFORE the epoch commits, so on restart
    the stream MUST replay precisely the uncommitted offset range through
    ``readBetweenOffsets``.  The observable contract this pins down:

    - the raw (non-transactional) sink output contains duplicates for the
      crashed epoch — proof the crash landed before the commit and the
      replay path actually ran (at-least-once below the dedup);
    - nothing is lost: every seeded ready row reaches the sink;
    - dedup by business key on the consumer side yields EXACTLY the
      seeded set — exactly-once observable, which is the whole upgrade
      over the reference's in-memory high-water mark
      (AsyncInvInSource.java:35-49: a crash there re-polls from id 0 or,
      with the commented-out variant, skips unread rows entirely)."""
    import json

    db = str(tmp_path / "queue.db")
    conn = sqlite3.connect(db)
    for ddl in DDL:
        conn.execute(ddl)
    conn.commit()
    conn.close()
    _seed(db, 20, 0)

    spark.dataSource.register(TableQueueDataSource)
    sink_path = tmp_path / "sink.jsonl"
    crash_marker = tmp_path / "crashed.marker"

    def write_then_maybe_crash(batch_df, batch_id):
        rows = [
            {"batch_id": batch_id, "id": r.id, "sid": r.sid}
            for r in batch_df.collect()
        ]
        with open(sink_path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        # crash AFTER the write, BEFORE Spark records the epoch commit —
        # exactly once, on the second epoch that actually carries rows
        if rows and batch_id >= 1 and not crash_marker.exists():
            crash_marker.write_text(str(batch_id))
            raise RuntimeError("injected sink crash before epoch commit")

    def run():
        stream = (
            spark.readStream.format("table_queue")
            .option("db_path", db)
            .option("table", "async_inv_in")
            .option("fetch_size", "5")   # 20 seeded rows → 4 epochs
            .load()
        )
        return (
            stream.writeStream.foreachBatch(write_then_maybe_crash)
            .option("checkpointLocation", str(tmp_path / "ckpt-crash"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def sink_rows():
        if not sink_path.exists():
            return []
        return [
            json.loads(line)
            for line in sink_path.read_text().splitlines()
            if line
        ]

    q = run()
    deadline = time.time() + 60
    while time.time() < deadline and q.exception() is None:
        time.sleep(0.5)
    assert q.exception() is not None, "injected crash never fired"
    q.stop()
    crashed_epoch = int(crash_marker.read_text())

    q2 = run()  # restart from the same checkpoint
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(
            {r["sid"] for r in sink_rows()}
        ) < 20:
            time.sleep(0.5)
            assert q2.exception() is None, f"restart failed: {q2.exception()}"
    finally:
        q2.stop()

    rows = sink_rows()
    sids = [r["sid"] for r in rows]
    # the crashed epoch was written, crashed, and then REPLAYED with the
    # identical offset range — its rows appear twice in the raw sink
    replayed = [r["sid"] for r in rows if r["batch_id"] == crashed_epoch]
    assert replayed, "crashed epoch never replayed after restart"
    assert any(sids.count(s) == 2 for s in replayed), (
        "no duplicate from the crashed epoch — the crash must have landed "
        "after the commit, so the replay path was never exercised"
    )
    # nothing lost, and dedup-by-key is exactly the seeded set
    assert {r["sid"] for r in rows} == {f"S-{i}" for i in range(20)}
    # no row outside the crashed epoch's replay was ever double-delivered
    from collections import Counter

    over_delivered = {
        s: c for s, c in Counter(sids).items() if c > 2
        or (c == 2 and s not in replayed)
    }
    assert not over_delivered, f"unexpected re-delivery: {over_delivered}"
