"""Streaming CDC snapshot maintenance: a ``foreachBatch`` sink that folds
each micro-batch of keyed change rows (D/U/I, the ``functions/cdc.py``
contract) into a versioned snapshot table.

This is the streaming half of the MERGE story the reference performs
row-at-a-time against MySQL (`REF/sink/InvoiceRetrySink.java:33-42`):
change batches arrive continuously, the snapshot is always readable, and
a crash never exposes a half-merged state.  Storage reuses the sketch
rollups' version-directory swap (write a fresh version dir, then retarget
the atomic marker — ``streaming/sketch_rollup.py``).

Replay semantics: UNLIKE the bloom rollup (bit-OR, idempotent) and LIKE
the CMS rollup (SUM, not idempotent), CDC apply is NOT replay-safe on its
own — deletes and updates re-apply harmlessly, but a replayed INSERT
whose previous attempt committed would duplicate its row (the base now
holds the inserted key, and ``apply_changes`` unions the payload in
again).  So this writer carries the same batch-id fence the CMS rollup
uses: the marker records the last merged batch id atomically with the
version, and a replayed epoch is a no-op.  Consequence (also inherited):
one snapshot belongs to ONE stream lineage — a fresh checkpoint restarts
batch ids at 0 and would be fenced off; point a new stream at a new
table path.

At scale the full-snapshot rewrite per batch becomes partition overwrite
on the touched key partitions only (the matview pattern,
``streaming/matview.py``); the merge plan itself — one key anti join +
union — is unchanged by that substitution.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.cdc import apply_changes
from .sketch_rollup import _marker_state, _swap_in, read_versioned


def read_snapshot(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Current snapshot rows, or an empty frame before the first batch.
    ``schema`` describes the payload columns (no ``src`` — the snapshot
    stores payloads; provenance labels are per-merge outputs)."""
    return read_versioned(spark, path, schema)


def cdc_snapshot_writer(table_path: str, keys: list[str], schema: str):
    """``foreachBatch`` function maintaining a CDC-merged snapshot.

    Usage::

        changes.writeStream.foreachBatch(
            cdc_snapshot_writer(path, ["k"], "k LONG, v STRING")
        )

    Each batch must carry ``op`` plus the payload columns of ``schema``
    (at most one change row per key per batch — collapse upstream).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return  # replayed epoch: the insert fence (see module doc)
        prev = read_snapshot(spark, table_path, schema)
        merged = apply_changes(prev, batch_df, keys).drop("src")
        # materialize before the swap retires the version dir the plan
        # reads (same reasoning as the sketch rollups)
        merged = merged.localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process
