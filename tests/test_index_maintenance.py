"""Streaming trigram-index maintenance: micro-batches extend the
persisted index incrementally (bootstrap files untouched), probes see
new documents immediately, and a replayed epoch never duplicates
postings."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Row

from flink_invoice_processor_spark.functions import retrieval as RET
from flink_invoice_processor_spark.streaming.index_maintenance import (
    index_micro_batch,
    run_trigram_index_job,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    RET.build_trigram_index(_docs(spark, [(1, "slow join here")]), idx,
                            n_buckets=8)
    batch = _docs(spark, [(2, "another slow join arrives")])
    index_micro_batch(batch, 7, idx)
    n_once = spark.read.parquet(idx).count()
    index_micro_batch(batch, 7, idx)  # at-least-once replay of epoch 7
    assert spark.read.parquet(idx).count() == n_once
    # and a DIFFERENT epoch extends rather than overwrites
    index_micro_batch(_docs(spark, [(3, "slow join again")]), 8, idx)
    assert spark.read.parquet(idx).count() > n_once


def test_streaming_job_extends_probes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    idx = str(tmp_path / "idx")
    corpus0 = [(1, "slow join base doc"), (2, "nothing to see")]
    RET.build_trigram_index(_docs(spark, corpus0), idx, n_buckets=8)

    (src / "a.jsonl").write_text(
        "\n".join(json.dumps({"doc_id": 10 + i, "text": t}) for i, t in
                  enumerate(["fresh slow join arrival", "still nothing"]))
        + "\n"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = run_trigram_index_job(
        stream, idx, str(tmp_path / "ckpt"), trigger_seconds=1
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] >= 0 and any(
                os.path.isdir(os.path.join(idx, d)) and "batch=-1" not in d
                for d in os.listdir(idx) if d.startswith("tri_bucket=")
            ):
                # at least one bucket dir exists; check an increment landed
                found = any(
                    "batch=-1" != b
                    for d in os.listdir(idx) if d.startswith("tri_bucket=")
                    for b in os.listdir(os.path.join(idx, d))
                    if b.startswith("batch=")
                )
                if found:
                    break
            time.sleep(0.5)
    finally:
        q.stop()

    all_docs = _docs(
        spark, corpus0 + [(10, "fresh slow join arrival"), (11, "still nothing")]
    )
    got = {
        r.doc_id
        for r in RET.substring_search_indexed(
            all_docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert got == {1, 10}


def _batch_dirs(idx):
    return sorted({
        b
        for d in os.listdir(idx) if d.startswith("tri_bucket=")
        for b in os.listdir(os.path.join(idx, d)) if b.startswith("batch=")
    })


def test_compaction_folds_increments_and_preserves_probes(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = [(1, "slow join base doc"), (2, "nothing to see")]
    RET.build_trigram_index(_docs(spark, corpus), idx, n_buckets=8)
    adds = [(3, "slow join increment one"), (4, "slow join increment two")]
    index_micro_batch(_docs(spark, adds[:1]), 0, idx)
    index_micro_batch(_docs(spark, adds[1:]), 1, idx)
    all_docs = _docs(spark, corpus + adds)
    before = {
        r.doc_id
        for r in RET.substring_search_indexed(
            all_docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert before == {1, 3, 4}
    assert RET.compact_trigram_index(spark, idx, upto_batch=1) == 2
    # every increment folded into the base; probe results unchanged
    assert _batch_dirs(idx) == ["batch=-1"]
    after = {
        r.doc_id
        for r in RET.substring_search_indexed(
            all_docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert after == before
    # re-running is a no-op
    assert RET.compact_trigram_index(spark, idx, upto_batch=5) == 0


def test_compaction_collapses_duplicate_postings(spark, tmp_path):
    """A crash between the base rewrite and the directory sweep (or a
    violated concurrency contract) leaves increments the base already
    duplicates — probes stay right and a re-run heals."""
    idx = str(tmp_path / "idx")
    doc = [(1, "slow join once")]
    RET.build_trigram_index(_docs(spark, doc), idx, n_buckets=8)
    index_micro_batch(_docs(spark, doc), 0, idx)  # re-ingest: duplicates
    assert RET.compact_trigram_index(spark, idx, upto_batch=0) == 1
    base = spark.read.parquet(idx)
    # exact duplicates collapsed in the fold
    assert base.count() == base.dropDuplicates(["tri", "doc_id"]).count()
    # simulate the crash window: the same increment reappears post-fold
    index_micro_batch(_docs(spark, doc), 0, idx)
    got = {
        r.doc_id
        for r in RET.substring_search_indexed(
            _docs(spark, doc), "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert got == {1}
    assert RET.compact_trigram_index(spark, idx, upto_batch=0) == 1  # heals
    assert _batch_dirs(idx) == ["batch=-1"]


def test_compaction_leaves_newer_epochs_alone(spark, tmp_path):
    idx = str(tmp_path / "idx")
    RET.build_trigram_index(_docs(spark, [(1, "slow join a")]), idx,
                            n_buckets=8)
    index_micro_batch(_docs(spark, [(2, "slow join b")]), 0, idx)
    index_micro_batch(_docs(spark, [(3, "slow join c")]), 1, idx)
    assert RET.compact_trigram_index(spark, idx, upto_batch=0) == 1
    # epoch 1 still stands as its own replay-idempotent increment
    assert _batch_dirs(idx) == ["batch=-1", "batch=1"]
    all_docs = _docs(spark, [(1, "slow join a"), (2, "slow join b"),
                             (3, "slow join c")])
    got = {
        r.doc_id
        for r in RET.substring_search_indexed(
            all_docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()
    }
    assert got == {1, 2, 3}
