"""Landing-fan audit for every dir-partitioned store writer: each
micro-batch epoch must land ONE file per touched partition directory,
not one file per (input task x directory) pair.

Why this is a scale invariant (the r12 matview decomposition): an
unpartitioned batch arriving from T shuffle/input tasks into D
partition dirs writes T x D files per epoch — at the decade that file
fan alone was 768 files and 7.7 s per epoch for the hourly matview,
vs 24 files / 1.8 s after ``repartition(<dir key>)``.  Writers that
co-locate rows on the directory key before the write (the chunk
store's bucket repartition is the original pattern) pay one bounded
shuffle and keep the file count equal to the touched-dir count, which
is what object stores and downstream scans need at 100 TB.

Covered writers (one test each, input forced to 4 partitions so a
missing co-locate repartition would visibly fan to up to 4 files/dir):

- ``streaming/matview.py``   base (hour, epoch) + view (hour)
- ``streaming/scd2_job.py``  base (ub, epoch)   + view (ub)
- ``streaming/chunk_maintenance.py`` store (bucket, batch)
- ``functions/retrieval.py`` trigram index (tri_bucket, batch),
  bootstrap + increment + compaction

Version-swap writers (sketch rollups, cdc snapshot, drift, decayed)
write a SINGLE un-partitioned version dir per epoch — no directory
fan is possible by construction; their file count equals the final
stage's partition count (model-sized aggregates coalesce under AQE,
the cdc snapshot's parallelism is the natural write width).  The
curation job coalesces to one file explicitly.  See SCALE.md
"Landing-fan sweep (r13)" for the measured figures.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Row, functions as F

SENTINEL_DIRS = {"batch=-2", "bucket=-2", "tri_bucket=-2"}


def files_per_dir(root: str) -> dict[str, int]:
    """parquet part-file count per leaf partition directory, sentinel
    schema dirs excluded."""
    out: dict[str, int] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        if any(part in SENTINEL_DIRS for part in rel.split(os.sep)):
            continue
        n = sum(
            1
            for f in filenames
            if f.endswith(".parquet") and not f.startswith(".")
        )
        if n:
            out[rel] = n
    return out


def _assert_one_file_per_dir(root: str, expect_dirs: int | None = None):
    per_dir = files_per_dir(root)
    assert per_dir, f"no parquet files under {root}"
    fanned = {d: n for d, n in per_dir.items() if n != 1}
    assert not fanned, f"file fan under {root}: {fanned}"
    if expect_dirs is not None:
        assert len(per_dir) == expect_dirs, (root, sorted(per_dir))


def _events(spark, n_hours: int, rows_per_hour: int = 40):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            ts=base + datetime.timedelta(hours=h, seconds=7 * i),
            event_type=["click", "view", "buy"][i % 3],
            value=float(i) / 7.0,
            user_id=(i * 13 + h) % 50,
        )
        for h in range(n_hours)
        for i in range(rows_per_hour)
    ]
    # 4 input partitions: a writer that skips the co-locate repartition
    # fans every dir by up to 4x and fails the assertion
    return spark.createDataFrame(rows).repartition(4)


def test_matview_base_and_view_land_one_file_per_dir(spark, tmp_path):
    from flink_invoice_processor_spark.streaming.matview import (
        upsert_hourly_counts,
    )

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    ev = _events(spark, n_hours=6)
    upsert_hourly_counts(spark, ev, base, view, 0)
    # base: 6 hour-dirs x epoch=0, exactly one file each
    _assert_one_file_per_dir(base, expect_dirs=6)
    _assert_one_file_per_dir(view, expect_dirs=6)
    # second epoch touches 2 of the hours again: only those (hour,
    # epoch=1) dirs appear, still one file each
    e1 = ev.where(F.hour("ts") < 2)
    upsert_hourly_counts(spark, e1, base, view, 1)
    per_dir = files_per_dir(base)
    assert len(per_dir) == 8 and set(per_dir.values()) == {1}, per_dir
    _assert_one_file_per_dir(view, expect_dirs=6)


def test_scd2_base_and_view_land_one_file_per_dir(spark, tmp_path):
    from flink_invoice_processor_spark.streaming.scd2_job import upsert_scd2

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    ev = _events(spark, n_hours=3).select("user_id", "ts", "event_type")
    upsert_scd2(spark, ev, base, view, 0, n_buckets=4)
    _assert_one_file_per_dir(base, expect_dirs=4)
    _assert_one_file_per_dir(view, expect_dirs=4)
    upsert_scd2(spark, ev.limit(30), base, view, 1, n_buckets=4)
    per_dir = files_per_dir(base)
    assert set(per_dir.values()) == {1}, per_dir
    _assert_one_file_per_dir(view, expect_dirs=4)


def test_chunk_store_lands_one_file_per_bucket_dir(spark, tmp_path):
    from flink_invoice_processor_spark.streaming.chunk_maintenance import (
        init_chunk_store,
        update_chunk_store,
    )

    store = str(tmp_path / "store")
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=text + f"tail {i}") for i in range(24)]
    ).repartition(4)
    init_chunk_store(spark, store, window=4, n_buckets=4)
    update_chunk_store(docs, store, 0)
    per_dir = files_per_dir(store)
    data_dirs = {d: n for d, n in per_dir.items() if "batch=0" in d}
    assert data_dirs and set(data_dirs.values()) == {1}, per_dir


def test_trigram_index_lands_one_file_per_bucket_dir(spark, tmp_path):
    from flink_invoice_processor_spark.functions.retrieval import (
        build_trigram_index,
        compact_trigram_index,
        update_trigram_index,
    )

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} about spark engines")
         for i in range(24)]
    ).repartition(4)
    build_trigram_index(docs, idx, n_buckets=4)
    _assert_one_file_per_dir(idx)
    more = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"fresh batch text {i}") for i in range(8)]
    ).repartition(4)
    update_trigram_index(more, idx, batch_id=1)
    _assert_one_file_per_dir(idx)
    compact_trigram_index(spark, idx, upto_batch=1)
    _assert_one_file_per_dir(idx)
