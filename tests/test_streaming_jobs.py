"""End-to-end pipeline test: packets flow through the streaming request job
into the table-queue substrate, the simulated external service responds, and
the response job assembles/routes packets and log-and-deletes — the full
lifecycle of the two reference jobs on a SQLite stand-in."""

from __future__ import annotations

import json
import sqlite3

import pytest

from flink_invoice_processor_spark.config import EngineConfig
from flink_invoice_processor_spark.sinks.dbapi import SqliteConnFactory
from flink_invoice_processor_spark.streaming.jobs import (
    response_cycle,
    run_invoice_request_job,
)

from test_sinks_sources import DDL

CFG = EngineConfig()


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "engine.db")
    conn = sqlite3.connect(path)
    for ddl in DDL:
        conn.execute(ddl)
    conn.commit()
    conn.close()
    return SqliteConnFactory(path)


def q(factory, sql, params=()):
    conn = factory()
    try:
        return conn.execute(sql, params).fetchall()
    finally:
        conn.close()


def packet(*elems):
    return json.dumps({"inv_pack": list(elems)})


def test_full_lifecycle(spark, db, tmp_path):
    # --- stage packets as a file stream (stand-in for the Kafka source) ---
    src_dir = tmp_path / "stream-in"
    src_dir.mkdir()
    packets = [
        packet(
            {"api_type": 10, "sid": "S-1", "syncid": "Y-1", "stax": "111"},
            {"api_type": 11, "sid": "S-2", "syncid": "Y-2", "stax": "222"},
            {"api_type": 10, "sid": "S-3", "inv": {"x": 1}},  # no stax → retry
        )
    ]
    (src_dir / "batch0.txt").write_text("\n".join(packets))
    stream = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(src_dir))
    )

    # --- run the streaming request job to completion -----------------------
    query = run_invoice_request_job(
        spark, CFG, db, str(tmp_path / "ckpt"), source=stream
    )
    query.processAllAvailable()
    query.stop()

    rows = q(db, "SELECT sid, api_type, state, res_type FROM async_inv_in ORDER BY sid")
    assert rows == [("S-1", 10, 0, None), ("S-2", 11, 0, None)]
    assert q(db, "SELECT sid, error_message, state FROM invoice_retry") == [
        ("S-3", "stax is null", "PENDING")
    ]

    # --- simulate the external invoice service writing results -------------
    conn = db()
    conn.execute(
        "UPDATE async_inv_in SET res_type = 2, state = 4, "
        "fpt_einvoice_res_code = '200', fpt_einvoice_res_json = '{\"ok\":1}'"
    )
    conn.execute(
        "INSERT INTO async_inv_out (tax_schema, gdt_res, sid, syncid, retry, "
        "state, group_id, res_type, api_type) "
        "VALUES ('333', '{\"gdt\":2}', 'S-9', 'Y-9', 0, 0, 0, 2, 10)"
    )
    conn.commit()
    conn.close()

    # --- one response cycle: poll → assemble → kafka-equivalent → log+delete
    collected = []

    def packet_sink(packets_df):
        collected.extend(packets_df.collect())

    response_cycle(spark, CFG, db, packet_sink)

    by_topic = {r.topic: json.loads(r.packet_json) for r in collected}
    crt_items = by_topic["mtt.crt.response"]["inv_pack_res"]
    # api_type 10 batch: S-1 (fpt) and S-9 (gdt) — same envelope
    assert {i["sid"] for i in crt_items} == {"S-1", "S-9"}
    fpt = next(i for i in crt_items if i["sid"] == "S-1")
    assert fpt["status"] == "success" and fpt["data"] == {"ok": 1}
    gdt = next(i for i in crt_items if i["sid"] == "S-9")
    assert gdt["res_resource"] == "gdt" and gdt["data"] == {"gdt": 2}
    upd_items = by_topic["mtt.upd.response"]["inv_pack_res"]
    assert [i["sid"] for i in upd_items] == ["S-2"]

    # processed rows moved to the success log, sources emptied
    assert q(db, "SELECT count(*) FROM async_inv_in") == [(0,)]
    assert q(db, "SELECT count(*) FROM async_inv_out") == [(0,)]
    logged = q(db, "SELECT sid, gdt_res FROM async_inv_succ_log ORDER BY sid")
    assert [r[0] for r in logged] == ["S-1", "S-2", "S-9"]
    assert logged[2][1] == '{"gdt":2}'

    # retry row from stage 1 still pending (it belongs to the REQUEST job)
    assert q(db, "SELECT count(*) FROM invoice_retry") == [(1,)]


def test_request_job_replay_safety(spark, db, tmp_path):
    # restarting from the same checkpoint does not re-insert rows
    src_dir = tmp_path / "stream-in"
    src_dir.mkdir()
    (src_dir / "a.txt").write_text(
        packet({"api_type": 10, "sid": "S-1", "syncid": "Y-1", "stax": "1"})
    )
    stream = spark.readStream.format("text").schema("value string").load(str(src_dir))
    ckpt = str(tmp_path / "ckpt")
    query = run_invoice_request_job(spark, CFG, db, ckpt, source=stream)
    query.processAllAvailable()
    query.stop()
    assert q(db, "SELECT count(*) FROM async_inv_in") == [(1,)]

    stream2 = spark.readStream.format("text").schema("value string").load(str(src_dir))
    query2 = run_invoice_request_job(spark, CFG, db, ckpt, source=stream2)
    query2.processAllAvailable()
    query2.stop()
    assert q(db, "SELECT count(*) FROM async_inv_in") == [(1,)]
