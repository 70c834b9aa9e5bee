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
    """Crash-replay: foreachBatch re-delivers an epoch whose increment
    already committed — the dynamic overwrite must rewrite identical
    content, never append duplicates.

    Pins the STRONG property (the matview/scd2/cdc r12-r13 discipline):
    the replay is a bit-exact no-op on the WHOLE multi-bucket,
    multi-epoch index — every (tri, doc_id, tri_bucket, batch) row
    identical before/after — and the SERVED probe rows are identical
    too.  This test is the reason the gated query
    ``trigram_index_served`` no longer re-runs the replay leg per pass
    (r14)."""
    idx = str(tmp_path / "idx")
    corpus = [(1, "slow join here"), (2, "nothing to see")]
    RET.build_trigram_index(_docs(spark, corpus), idx, n_buckets=8)
    index_micro_batch(_docs(spark, [(3, "early slow join epoch")]), 6, idx)
    batch = _docs(spark, [(4, "another slow join arrives"),
                          (5, "and more text rows")])
    index_micro_batch(batch, 7, idx)

    def snap_index():
        return sorted(map(tuple, spark.read.parquet(idx).collect()))

    all_docs = _docs(spark, corpus + [(3, "early slow join epoch"),
                                      (4, "another slow join arrives"),
                                      (5, "and more text rows")])

    def snap_served():
        return sorted(map(tuple, RET.substring_search_indexed(
            all_docs, "slow join", idx, max_trigram_doc_freq=1000
        ).collect()))

    index_once, served_once = snap_index(), snap_served()
    assert {r[0] for r in served_once} == {1, 3, 4}
    index_micro_batch(batch, 7, idx)  # at-least-once replay of epoch 7
    assert snap_index() == index_once
    assert snap_served() == served_once
    # and a DIFFERENT epoch extends rather than overwrites
    index_micro_batch(_docs(spark, [(6, "slow join again")]), 8, idx)
    assert len(snap_index()) > len(index_once)


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
