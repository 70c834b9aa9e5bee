"""Streaming value-histogram rollup: merged per-batch histograms must
equal the batch histogram of everything seen, exact quantiles read from
the stored table must match the batch operator over all raw rows, and a
replayed epoch must be fenced (SUM-merge is not idempotent)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import stats as ST
from flink_invoice_processor_spark.streaming.sketch_rollup import (
    histogram_rollup_writer,
    read_histogram_table,
)

SCHEMA = "seg STRING, val LONG"


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_stream(spark, src, ckpt, table):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            histogram_rollup_writer(F.col("seg"), F.col("val"), str(table))
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_histogram_rollup_equals_batch_and_serves_exact_quantiles(
    spark, tmp_path
):
    src, table = tmp_path / "in", tmp_path / "hist"
    rows_a = [{"seg": "a", "val": i % 7} for i in range(100)]
    rows_b = [{"seg": "a", "val": i % 5} for i in range(50)] + [
        {"seg": "b", "val": i} for i in range(20)
    ]
    _write(src, "a.jsonl", rows_a)
    time.sleep(0.01)
    _write(src, "b.jsonl", rows_b)
    _run_stream(spark, src, tmp_path / "ckpt", table)

    stored = read_histogram_table(spark, str(table))
    all_rows = spark.createDataFrame(
        [(r["seg"], r["val"]) for r in rows_a + rows_b], SCHEMA
    )
    batch_hist = ST.value_histogram(
        all_rows.select(F.col("seg").alias("k"), F.col("val")), "k", "val"
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, batch_hist.collect())
    )

    # exact quantiles from the MAINTAINED table == batch operator on raw
    served = {
        r["k"]: r
        for r in ST.quantiles_from_histogram(
            stored, "k", (50, 90, 99)
        ).collect()
    }
    direct = {
        r["k"]: r
        for r in ST.grouped_quantiles(
            all_rows.select(F.col("seg").alias("k"), F.col("val")),
            "k",
            "val",
            (50, 90, 99),
        ).collect()
    }
    assert served == direct

    # state bound: rows == distinct (seg, val), not raw row count
    assert stored.count() == all_rows.distinct().count()


def test_histogram_rollup_replayed_epoch_is_fenced(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "hist"
    rows = [{"seg": "a", "val": i % 3} for i in range(30)]
    _write(src, "a.jsonl", rows)
    _run_stream(spark, src, tmp_path / "ckpt", table)
    before = sorted(map(tuple, read_histogram_table(spark, str(table)).collect()))

    # foreachBatch replays the SAME epoch after a crash-before-commit:
    # counts merge by SUM, so without the fence this would double-count
    batch_df = spark.createDataFrame(
        [(r["seg"], r["val"]) for r in rows], SCHEMA
    )
    histogram_rollup_writer(F.col("seg"), F.col("val"), str(table))(
        batch_df, 0
    )
    after = sorted(map(tuple, read_histogram_table(spark, str(table)).collect()))
    assert after == before

    # a genuinely NEW batch id does merge
    histogram_rollup_writer(F.col("seg"), F.col("val"), str(table))(
        batch_df, 99
    )
    doubled = {
        (r["k"], r["val"]): r["cnt"]
        for r in read_histogram_table(spark, str(table)).collect()
    }
    assert all(c == 20 for c in doubled.values())
