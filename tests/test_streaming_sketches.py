"""Streaming KMV rollup: sketch partials merged across micro-batches must
equal the batch sketch of everything seen (the KMV merge law), state must
stay O(segments * k), and re-processing a batch must be idempotent."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from flink_invoice_processor_spark.functions import sketches as SK
from flink_invoice_processor_spark.streaming.sketch_rollup import (
    kmv_rollup_writer,
    read_sketch_table,
)

SCHEMA = "seg STRING, val LONG"


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_stream(spark, src, tmp_path, table, k):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            kmv_rollup_writer(F.col("seg"), F.col("val"), str(table), k=k)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_rollup_equals_batch_sketch(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "sketch"
    rows_a = [{"seg": "a", "val": i} for i in range(200)]
    rows_b = [{"seg": "a", "val": i} for i in range(100, 300)] + [
        {"seg": "b", "val": i} for i in range(10)
    ]
    _write(src, "a.jsonl", rows_a)
    time.sleep(0.01)
    _write(src, "b.jsonl", rows_b)
    k = 16
    _run_stream(spark, src, tmp_path, table, k)

    stored = read_sketch_table(spark, str(table))
    # state bound: never more than k rows per segment
    per_seg = {r.segment: r.n for r in stored.groupBy("segment").agg(
        F.count("*").alias("n")).collect()}
    assert all(n <= k for n in per_seg.values()) and set(per_seg) == {"a", "b"}

    # merge law: stored partials == batch sketch over ALL rows seen
    all_rows = spark.createDataFrame(
        [(r["seg"], r["val"]) for r in rows_a + rows_b], SCHEMA
    )
    batch = SK.kmv_sketch(all_rows, F.col("seg"), F.col("val"), k=k)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # estimates agree too (same estimator over identical sketch rows)
    est_stream = {
        r.segment: r.est_distinct
        for r in SK.kmv_estimates(stored, k=k).collect()
    }
    est_batch = {
        r.segment: r.est_distinct
        for r in SK.kmv_estimates(batch, k=k).collect()
    }
    assert est_stream == est_batch
    assert est_batch["b"] == 10  # under k: the sketch IS the set, exact


def test_rollup_remerge_is_idempotent(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "sketch"
    rows = [{"seg": "s", "val": i} for i in range(100)]
    _write(src, "a.jsonl", rows)
    _run_stream(spark, src, tmp_path, table, k=8)
    first = sorted(map(tuple, read_sketch_table(spark, str(table)).collect()))

    # replay the same data through a FRESH stream (new checkpoint) into the
    # same sketch table — the merge must not change the state
    _run_stream(spark, src, tmp_path / "again", table, k=8)
    second = sorted(map(tuple, read_sketch_table(spark, str(table)).collect()))
    assert first == second


def test_rollup_retires_old_version_dirs(spark, tmp_path):
    src, table = tmp_path / "in", tmp_path / "sketch"
    for i in range(4):
        _write(src, f"f{i}.jsonl", [{"seg": "s", "val": i * 10 + j} for j in range(5)])
        time.sleep(0.01)
    _run_stream(spark, src, tmp_path, table, k=8)
    vdirs = [d for d in table.iterdir() if d.name.startswith("v") and d.is_dir()]
    # 4 micro-batches ran; only the current and prior version survive
    assert len(vdirs) <= 2


def test_cms_rollup_equals_batch_counters(spark, tmp_path):
    from flink_invoice_processor_spark.functions.sketches import cms_counters
    from flink_invoice_processor_spark.streaming.sketch_rollup import (
        cms_estimate,
        cms_rollup_writer,
        read_cms_table,
    )

    src, table = tmp_path / "in", tmp_path / "cms"
    rows_a = [{"seg": f"hot", "val": i} for i in range(60)] + [
        {"seg": f"k{i}", "val": i} for i in range(20)
    ]
    rows_b = [{"seg": f"hot", "val": i} for i in range(40)]
    _write(src, "a.jsonl", rows_a)
    time.sleep(0.01)
    _write(src, "b.jsonl", rows_b)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            cms_rollup_writer(F.col("seg"), str(table), depth=2, width=32)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = read_cms_table(spark, str(table))
    assert stored.count() <= 2 * 32  # state bound

    # merge law: stored counters == batch counters over ALL rows seen
    all_rows = spark.createDataFrame(
        [(r["seg"], r["val"]) for r in rows_a + rows_b], SCHEMA
    )
    batch = cms_counters(all_rows, F.col("seg"), depth=2, width=32)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # estimates upper-bound the true counts; 'hot' (100 of 120 rows)
    # dominates its buckets so its estimate is exact here or near-exact
    keys = spark.createDataFrame([("hot",), ("k0",), ("nope",)], "seg string")
    est = {
        r.hh_key: r.est_count
        for r in cms_estimate(
            stored, keys, F.col("seg"), depth=2, width=32
        ).collect()
    }
    assert est["hot"] >= 100
    assert est["k0"] >= 1
    assert est["nope"] >= 0  # unseen key: pure collision noise, still >= 0


def test_cms_rollup_replayed_epoch_is_fenced(spark, tmp_path):
    from flink_invoice_processor_spark.streaming.sketch_rollup import (
        cms_rollup_writer,
        read_cms_table,
    )

    table = tmp_path / "cms"
    writer = cms_rollup_writer(F.col("seg"), str(table), depth=2, width=16)
    batch = spark.createDataFrame([("s", i) for i in range(30)], SCHEMA)
    writer(batch, 0)
    once = sorted(map(tuple, read_cms_table(spark, str(table)).collect()))
    # foreachBatch replays the SAME epoch after a crash-before-commit:
    # CMS cells merge by sum, so without the fence this would double-count
    writer(batch, 0)
    again = sorted(map(tuple, read_cms_table(spark, str(table)).collect()))
    assert once == again
    # the next real epoch still merges
    writer(spark.createDataFrame([("s", 100)], SCHEMA), 1)
    after = dict(
        ((r.row_i, r.bucket), r.cnt)
        for r in read_cms_table(spark, str(table)).collect()
    )
    assert sum(after.values()) == sum(c for *_ , c in once) + 2  # depth=2


def test_bloom_rollup_equals_batch_filter_and_replay_safe(spark, tmp_path):
    """Streamed bloom partials OR into exactly the batch-built filter of
    everything seen, probes answer with no false negatives, and
    re-merging a batch's words (the at-least-once replay) is a no-op —
    bloom needs no epoch fence, unlike CMS."""
    from flink_invoice_processor_spark.streaming.sketch_rollup import (
        bloom_rollup_writer,
        read_bloom_table,
    )

    src, table = tmp_path / "in", tmp_path / "bloom"
    rows_a = [{"seg": "x", "val": i} for i in range(0, 40)]
    rows_b = [{"seg": "x", "val": i} for i in range(20, 80)]
    _write(src, "a.jsonl", rows_a)
    time.sleep(0.01)
    _write(src, "b.jsonl", rows_b)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            bloom_rollup_writer(F.col("val"), str(table), m_bits=300, k=3)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = read_bloom_table(spark, str(table))
    assert stored.count() <= 5  # 300 / 60 words, state bounded

    all_rows = spark.createDataFrame(
        [(r["seg"], r["val"]) for r in rows_a + rows_b], SCHEMA
    )
    direct = SK.bloom_words(all_rows, F.col("val"), m_bits=300, k=3)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # no false negatives for everything the stream saw
    probe = SK.bloom_probe(
        all_rows, F.col("val"), stored, m_bits=300, k=3
    )
    assert probe.where(~F.col("bloom_hit")).count() == 0

    # replay safety: OR-ing batch A's words in again changes nothing
    wa = SK.bloom_words(
        spark.createDataFrame([(r["seg"], r["val"]) for r in rows_a], SCHEMA),
        F.col("val"), m_bits=300, k=3,
    )
    remerged = (
        stored.unionByName(wa)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    assert sorted(map(tuple, remerged.collect())) == sorted(
        map(tuple, stored.collect())
    )
