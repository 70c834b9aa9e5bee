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

Registry form (r14, VERDICT r13 item 7): the invariant is asserted over
``WRITER_REGISTRY`` below — one entry per ``partitionBy`` writer call
site in the package — and ``test_every_partitionby_site_is_registered``
AST-sweeps the package so a FIFTH writer cannot land without either an
exercise entry (parametrized one-file-per-dir check) or a justified
exemption (single-file ``coalesce(1)`` report writers; the generic
``tables.write_partitioned`` helper, which co-locates inline).
"""

from __future__ import annotations

import ast
import datetime
import os

import pytest
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


# --------------------------------------------------------------------------
# Exercise functions: one per dir-partitioned store writer.  Each drives
# the REAL writer (4-partition input, multiple epochs where the writer
# maintains epochs) and asserts one file per touched partition dir.
# --------------------------------------------------------------------------

def _exercise_matview(spark, tmp_path):
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


def _exercise_scd2(spark, tmp_path):
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


def _exercise_chunk_store(spark, tmp_path):
    from flink_invoice_processor_spark.streaming.chunk_maintenance import (
        compact_chunk_store,
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
    # the compaction's base-generation rewrite is a partitioned writer
    # too — it must land one file per bucket dir
    compact_chunk_store(spark, store, 0)
    per_dir = files_per_dir(store)
    base_dirs = {d: n for d, n in per_dir.items() if "batch=-10" in d}
    assert base_dirs and set(base_dirs.values()) == {1}, per_dir


def _exercise_trigram_index(spark, tmp_path):
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


def _exercise_lsh_store(spark, tmp_path):
    from flink_invoice_processor_spark.functions.lsh_index import (
        build_lsh_store,
        compact_lsh_store,
        update_lsh_store,
    )

    store = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared prefix words document {i} end")
         for i in range(16)]
    ).repartition(4)
    meta = build_lsh_store(docs, store, k=8, bands=4, n=3, n_buckets=4)
    _assert_one_file_per_dir(store)
    more = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"shared prefix words document {i} end")
         for i in range(8)]
    ).repartition(4)
    update_lsh_store(more, store, 0, meta=meta).count()
    _assert_one_file_per_dir(store)
    compact_lsh_store(spark, store, upto_batch=0, meta=meta)
    _assert_one_file_per_dir(store)


# --------------------------------------------------------------------------
# The registry: EVERY .partitionBy( writer call site in the package,
# claimed either by an exercise function or by a justified exemption.
# Key = (module-relative path, sorted partition columns).
# --------------------------------------------------------------------------

WRITER_REGISTRY: dict[tuple[str, tuple[str, ...]], object] = {
    ("streaming/matview.py", ("epoch", "hour")): _exercise_matview,
    ("streaming/matview.py", ("hour",)): _exercise_matview,
    ("streaming/scd2_job.py", ("epoch", "ub")): _exercise_scd2,
    ("streaming/scd2_job.py", ("ub",)): _exercise_scd2,
    ("streaming/chunk_maintenance.py", ("batch", "bucket")):
        _exercise_chunk_store,
    ("functions/retrieval.py", ("batch", "tri_bucket")):
        _exercise_trigram_index,
    ("functions/lsh_index.py", ("band_bucket", "batch")):
        _exercise_lsh_store,
    # exemptions: no directory fan possible by construction
    ("streaming/chunk_maintenance.py", ("batch",)):
        "report increments coalesce(1) — one tiny file per epoch",
    ("streaming/lsh_maintenance.py", ("batch",)):
        "pair increments coalesce(1) — one tiny file per epoch",
    ("streaming/curation_job.py", ("batch",)):
        "score increments coalesce(1) — one tiny file per epoch",
    ("tables.py", ()):
        "write_partitioned co-locates inline (repartition(*partition_cols) "
        "immediately before its write) — the invariant is its own body",
}

_EXERCISES = sorted(
    {
        fn.__name__: fn
        for fn in WRITER_REGISTRY.values()
        if callable(fn)
    }.items()
)


@pytest.mark.parametrize("name,exercise", _EXERCISES, ids=lambda x: x
                         if isinstance(x, str) else "")
def test_writer_lands_one_file_per_dir(spark, tmp_path, name, exercise):
    exercise(spark, tmp_path)


def test_every_partitionby_site_is_registered():
    """AST sweep: every ``.partitionBy(`` WRITER call in the package
    (window specs excluded by shape) must be claimed in WRITER_REGISTRY
    — a new dir-partitioned writer cannot land silently without either
    a one-file-per-dir exercise or a written exemption."""
    import flink_invoice_processor_spark as pkg

    root = os.path.dirname(os.path.abspath(pkg.__file__))
    found: set[tuple[str, tuple[str, ...]]] = set()
    for dirpath, _dirs, files in os.walk(root):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            tree = ast.parse(open(path).read())
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "partitionBy"
                ):
                    continue
                # writer sites hang off a .write/.writer chain or a
                # variable; WINDOW partitionBy is Window.partitionBy /
                # W.partitionBy — a Name receiver named like a Window
                recv = node.func.value
                if isinstance(recv, ast.Name) and recv.id in (
                    "Window", "W",
                ):
                    continue
                cols = tuple(sorted(
                    a.value for a in node.args
                    if isinstance(a, ast.Constant) and isinstance(a.value, str)
                ))
                found.add((rel, cols))
    assert found, "AST sweep found no partitionBy writers - scanner broken?"
    unclaimed = found - set(WRITER_REGISTRY)
    assert not unclaimed, (
        "dir-partitioned writer sites missing from WRITER_REGISTRY "
        f"(add an exercise or a justified exemption): {sorted(unclaimed)}"
    )
