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
