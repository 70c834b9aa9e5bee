"""Persisted MinHash-LSH band store: incremental dedup-against-history.

The contract under test: streaming a corpus through the store in ANY
batch split emits, across all epochs, the EXACT pair set (including
n_shared_bands) of one-shot ``dedup.minhash_lsh_pairs`` over the whole
corpus; replayed epochs duplicate nothing; compaction folds increments
without changing any future probe.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import lsh_index as LX
from flink_invoice_processor_spark.streaming.lsh_maintenance import (
    lsh_micro_batch,
    run_lsh_dedup_job,
)

# a corpus with exact dups, near-dups, and unrelated docs spread so that
# pairs cross batch boundaries in every split used below
CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "totally unrelated text about distributed query engines"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "sparks fly when catalysts optimize logical plans nightly"),
    (5, "the quick brown fox jumps over the lazy dog tonight"),
    (6, "totally unrelated text about distributed query engines"),
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def _pairs_set(df):
    return {
        (r.doc_id_a, r.doc_id_b, r.n_shared_bands) for r in df.collect()
    }


def _batch_pairs(spark):
    return _pairs_set(DD.minhash_lsh_pairs(_docs(spark, CORPUS), k=16, bands=4))


def test_cumulative_pairs_equal_batch_recompute(spark, tmp_path):
    """Three uneven increments -> exactly the one-shot pair set."""
    store = str(tmp_path / "store")
    LX.build_lsh_store(_docs(spark, CORPUS[:1]), store, n_buckets=8)
    got = set()
    for epoch, batch in enumerate([CORPUS[1:3], CORPUS[3:4], CORPUS[4:]]):
        got |= _pairs_set(
            LX.update_lsh_store(_docs(spark, batch), store, batch_id=epoch)
        )
    assert got == _batch_pairs(spark)


def test_single_batch_equals_self_join(spark, tmp_path):
    """All docs in one increment over an unrelated bootstrap doc: the
    new-vs-new path alone reproduces the self-join."""
    store = str(tmp_path / "store")
    LX.build_lsh_store(
        _docs(spark, [(99, "bootstrap only loner document here")]),
        store,
        n_buckets=8,
    )
    got = _pairs_set(
        LX.update_lsh_store(_docs(spark, CORPUS), store, batch_id=0)
    )
    assert got == _batch_pairs(spark)


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    meta = LX.build_lsh_store(_docs(spark, CORPUS[:2]), store, n_buckets=8)
    batch = _docs(spark, CORPUS[2:4])
    first = _pairs_set(LX.update_lsh_store(batch, store, 5, meta=meta))
    n_rows = spark.read.parquet(store).count()
    replay = _pairs_set(LX.update_lsh_store(batch, store, 5, meta=meta))
    assert replay == first  # probe excluded the epoch's own stored rows
    assert spark.read.parquet(store).count() == n_rows  # no duplicates
    # a LATER epoch sees the replayed docs as history exactly once
    later = _pairs_set(
        LX.update_lsh_store(_docs(spark, CORPUS[4:]), store, 6, meta=meta)
    )
    assert (first | later) == _batch_pairs(spark)


def test_compaction_preserves_future_probes(spark, tmp_path):
    store = str(tmp_path / "store")
    LX.build_lsh_store(_docs(spark, CORPUS[:2]), store, n_buckets=8)
    LX.update_lsh_store(_docs(spark, CORPUS[2:3]), store, 0)
    p1 = _pairs_set(LX.update_lsh_store(_docs(spark, CORPUS[3:4]), store, 1))
    assert LX.compact_lsh_store(spark, store, upto_batch=1) == 2
    batches = {
        b
        for d in os.listdir(store) if d.startswith("band_bucket=")
        for b in os.listdir(os.path.join(store, d)) if b.startswith("batch=")
    }
    assert batches == {"batch=-1"}
    p2 = _pairs_set(LX.update_lsh_store(_docs(spark, CORPUS[4:]), store, 2))
    early = _pairs_set(
        DD.minhash_lsh_pairs(_docs(spark, CORPUS[:3]), k=16, bands=4)
    )
    assert (early | p1 | p2) == _batch_pairs(spark)
    assert LX.compact_lsh_store(spark, store, upto_batch=2) == 1  # heals


def test_update_rejects_bootstrap_sentinel(spark, tmp_path):
    """batch_id=-1 would silently exclude all history from the probe and
    then overwrite the bootstrap partitions — must fail loudly."""
    import pytest

    store = str(tmp_path / "store")
    LX.build_lsh_store(_docs(spark, CORPUS[:2]), store, n_buckets=8)
    with pytest.raises(ValueError, match="batch_id must be >= 0"):
        LX.update_lsh_store(_docs(spark, CORPUS[2:3]), store, batch_id=-1)


def test_layout_pins_band_parameters(spark, tmp_path):
    store = str(tmp_path / "store")
    meta = LX.build_lsh_store(
        _docs(spark, CORPUS[:2]), store, k=16, bands=4, n=3, n_buckets=8
    )
    assert LX.read_store_meta(spark, store) == meta
    rows = spark.read.parquet(store)
    assert set(rows.columns) >= {"doc_id", "band_id", "band_hash",
                                 "band_bucket", "batch"}
    # bucket law: crc32(band_hash) % n_buckets, verifiable driver-side
    import zlib

    for r in rows.collect():
        assert r.band_bucket == zlib.crc32(r.band_hash.encode()) % 8


def test_streaming_job_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    store = str(tmp_path / "store")
    pairs_path = str(tmp_path / "pairs")
    LX.build_lsh_store(_docs(spark, CORPUS[:2]), store, n_buckets=8)
    for fname, rows in [("a.jsonl", CORPUS[2:4]), ("b.jsonl", CORPUS[4:])]:
        (src / fname).write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": t}) for i, t in rows
            )
            + "\n"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = run_lsh_dedup_job(
        stream, store, pairs_path, str(tmp_path / "ckpt"), trigger_seconds=1
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                n = spark.read.parquet(pairs_path).select(
                    "batch"
                ).distinct().count()
                if n >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    emitted = {
        (r.doc_id_a, r.doc_id_b, r.n_shared_bands)
        for r in spark.read.parquet(pairs_path).collect()
    }
    assert emitted == _batch_pairs(spark)


def test_init_pairs_table_readable_before_first_pair(spark, tmp_path):
    """An empty or pair-less prefix of epochs must not leave the pairs
    table unreadable: init lands a zero-row schema-bearing sentinel
    partition, later epoch writes coexist with it, and re-init (restart)
    never touches an existing table."""
    from flink_invoice_processor_spark.streaming.lsh_maintenance import (
        init_pairs_table,
    )

    pairs_path = str(tmp_path / "pairs")
    init_pairs_table(spark, pairs_path)
    first = spark.read.parquet(pairs_path)
    assert first.count() == 0
    assert set(first.columns) == {
        "doc_id_a", "doc_id_b", "n_shared_bands", "batch",
    }
    # a later epoch's dynamic overwrite coexists with the sentinel
    spark.createDataFrame(
        [(1, 2, 3)], "doc_id_a long, doc_id_b long, n_shared_bands long"
    ).withColumn("batch", F.lit(5)).coalesce(1).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch"
    ).parquet(pairs_path)
    # re-init after restart is a no-op: the epoch-5 row survives
    init_pairs_table(spark, pairs_path)
    after = spark.read.parquet(pairs_path)
    assert after.where("batch = 5").count() == 1
    assert after.count() == 1


def test_fuzzy_contamination_served_from_store_equals_batch(spark, tmp_path):
    """Batch/stream parity for the store-served fuzzy decontamination
    (round 9): stream the corpus through the pair store in two epochs,
    then ``fuzzy_contamination_from_store`` over the maintained pairs
    table must equal the one-shot batch report
    ``fuzzy_contamination(lsh_verified_pairs(docs), eval_ids)`` —
    bit for bit, jaccard included."""
    from flink_invoice_processor_spark.streaming.lsh_maintenance import (
        fuzzy_contamination_from_store,
        init_pairs_table,
        lsh_micro_batch,
    )

    store = str(tmp_path / "store")
    pairs_path = str(tmp_path / "pairs")
    meta = LX.build_lsh_store(
        _docs(spark, [(99, "bootstrap only loner document here")]),
        store,
        n_buckets=8,
    )
    init_pairs_table(spark, pairs_path)
    for epoch, batch in enumerate([CORPUS[:3], CORPUS[3:]]):
        lsh_micro_batch(
            _docs(spark, batch), epoch, store, pairs_path, meta=meta
        )

    docs = _docs(spark, CORPUS)
    # eval slice {3, 6}: flags 1 and 5 (near-dups of 3) and 2 (exact dup
    # of 6); 3-6 eval-eval and train-train pairs must not appear
    eval_ids = spark.createDataFrame([(3,), (6,)], "doc_id long")
    served = fuzzy_contamination_from_store(
        spark, pairs_path, docs, eval_ids
    )
    batch_rep = DD.fuzzy_contamination(
        DD.lsh_verified_pairs(docs, threshold=0.5), eval_ids
    )
    got = sorted(map(tuple, served.collect()))
    want = sorted(map(tuple, batch_rep.collect()))
    assert got == want
    assert {r[0] for r in got} == {1, 2, 5}
