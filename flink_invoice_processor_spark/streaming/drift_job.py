"""Streaming distribution-drift monitoring: each vector snapshot's
(dim, bin, cnt) micro-unit histogram maintained across micro-batches,
with the TVD drift report served from the two stored tables.

This is the monitoring story made continuous: the reference embedding
table streams in (this week's export), its bin histogram accrues
batch-by-batch, and at any moment the exact drift report against the
frozen baseline snapshot is one model-sized computation over two stored
d·n_bins-row tables — the raw corpora are never re-scanned and never
joined against each other.

ONE definition of the algebra: the per-batch histogram is
``functions/similarity.binned_counts`` and the report is
``functions/similarity.drift_from_bin_counts`` — the exact halves of the
batch ``distribution_drift`` operator, so the maintained report equals
the batch report over every vector ever streamed by construction
(pinned in tests/test_streaming_vector_stats.py).

Counts merge by SUM per (dim, bin) — not idempotent, so like the
CMS/histogram/vector-stats rollups a replayed at-least-once epoch is
fenced on the batch id recorded atomically with the version marker
(``streaming/sketch_rollup.py``'s version-directory swap); one table
belongs to one stream lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.similarity import binned_counts, drift_from_bin_counts
from .sketch_rollup import _marker_state, _swap_in, read_versioned

_BIN_SCHEMA = "dim INT, bin INT, cnt LONG"


def drift_histogram_writer(
    table_path: str,
    vec_col: str = "embedding",
    n_bins: int = 12,
    lo_micro: int = -600_000,
    bin_micro: int = 100_000,
):
    """``foreachBatch`` function maintaining one snapshot's bin
    histogram.

    Usage::

        stream.writeStream.foreachBatch(
            drift_histogram_writer(path)
        )

    State stays ≤ d·n_bins rows however much data streams through.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return
        batch_hist = binned_counts(
            batch_df, vec_col, n_bins, lo_micro, bin_micro
        )
        prev = read_drift_table(spark, table_path)
        merged = (
            prev.unionByName(batch_hist)
            .groupBy("dim", "bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        ).localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


def read_drift_table(spark: SparkSession, path: str) -> DataFrame:
    """Current (dim, bin, cnt) histogram, or empty before the first
    batch."""
    return read_versioned(spark, path, _BIN_SCHEMA)


def drift_report(
    spark: SparkSession,
    baseline_path: str,
    current_path: str,
    n_bins: int = 12,
    tvd_threshold6: int = 100_000,
) -> DataFrame:
    """The exact TVD drift report between two MAINTAINED snapshots —
    (dim, n_a, n_b, tvd6, drifted), computed over the two stored
    d·n_bins-row tables (no corpus scan)."""
    return drift_from_bin_counts(
        read_drift_table(spark, baseline_path),
        read_drift_table(spark, current_path),
        n_bins=n_bins,
        tvd_threshold6=tvd_threshold6,
    )
