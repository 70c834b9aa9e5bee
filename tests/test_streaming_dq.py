"""Streaming DQ gate: a micro-batch violating the declared suite is
quarantined whole; clean batches land in the good table; every batch
leaves a queryable check report.  Nothing stalls the stream."""

from __future__ import annotations

import json
import time

from flink_invoice_processor_spark.functions import quality as DQ

SCHEMA = "k LONG, q DOUBLE, f STRING"


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_gate_quarantines_bad_batch_passes_good(spark, tmp_path):
    src = tmp_path / "in"
    good, quar = tmp_path / "good", tmp_path / "quarantine"
    _write(src, "a.jsonl", [{"k": i, "q": 5.0, "f": "A"} for i in range(10)])
    time.sleep(0.01)
    # batch 2: out-of-range q values -> quarantined whole
    _write(src, "b.jsonl", [{"k": 100 + i, "q": 999.0, "f": "A"} for i in range(4)])
    time.sleep(0.01)
    _write(src, "c.jsonl", [{"k": 200 + i, "q": 7.0, "f": "N"} for i in range(6)])

    checks = [
        DQ.not_null("k"),
        DQ.in_range("q", 1, 50),
        DQ.accepted_values("f", ["A", "N", "R"]),
    ]
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(
            DQ.gated_writer(checks, str(good), str(quar))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    good_rows = spark.read.parquet(str(good))
    quar_rows = spark.read.parquet(str(quar))
    assert good_rows.count() == 16  # batches 1 and 3
    assert quar_rows.count() == 4  # batch 2, whole
    assert good_rows.where("q > 50").count() == 0

    reports = spark.read.parquet(str(good / "_dq_reports"))
    # one report row per check per batch, batch ids queryable
    assert reports.count() == 3 * 3
    failed = {
        (r.batch_id, r.check_name)
        for r in reports.where("status = 'fail'").collect()
    }
    assert all(name == "range(q)" for _, name in failed)
    assert len(failed) == 1


def test_gate_id_reuse_across_lineages_never_duplicates(spark, tmp_path):
    """A fresh checkpoint lineage reuses batch_id=N: if the new lineage's
    batch N lands in the OTHER table (verdict flipped), the stale copy in
    the sibling must be cleaned — a batch id exists in good or quarantine,
    never both."""
    good, quar = str(tmp_path / "good"), str(tmp_path / "quar")
    checks = [DQ.in_range("q", 1, 50)]
    writer = DQ.gated_writer(checks, good, quar)
    bad = spark.createDataFrame([(1, 999.0, "A")], SCHEMA)
    ok = spark.createDataFrame([(1, 5.0, "A")], SCHEMA)
    writer(bad, 0)  # lineage 1: batch 0 -> quarantine
    writer(ok, 0)   # lineage 2 (ids restart): batch 0 -> good
    assert spark.read.parquet(good).count() == 1
    # the quarantined copy of batch_id=0 is gone, not duplicated
    import os
    assert not os.path.exists(os.path.join(quar, "batch_id=0"))
    # and the reverse flip cleans the good side
    writer(bad, 0)
    assert not os.path.exists(os.path.join(good, "batch_id=0"))
    assert spark.read.parquet(quar).count() == 1
