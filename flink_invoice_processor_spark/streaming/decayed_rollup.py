"""Streaming decayed-feature rollup: exponentially time-decayed per-key
sums maintained across micro-batches.

The reference's only continuous aggregation is the count-or-timeout
response batcher (`REF/process/response/InvoiceResponseBatchProcessor.java:28-96`);
this is the feature-store extension: a ``foreachBatch`` sink that keeps
the (key → decayed count / decayed value-sum) table up to date as events
stream in.  The decisive design point is the DECAY REFERENCE INSTANT:
weights decayed to a *fixed* configured instant form exact BIGINT
micro-unit partials that merge by plain addition (``functions/windows.
decayed_counts_at`` — the same one function the batch operator form
calls, so batch/stream parity cannot drift), whereas weights decayed to
a data-derived max would need a rescale-on-merge whose re-rounding
breaks bit-exactness.  State is |keys| rows; per-batch work is one scan
of the batch plus a |keys|-sized merge — never a re-scan of history.

Serving "as of now" is one IEEE multiply over the |keys| stored rows
(:func:`decayed_asof`): the stored state stays exact; only the
serve-time scaling to a different instant rounds once more.

SUM-merge is not idempotent, so like the CMS/histogram rollups a
replayed at-least-once epoch is fenced on the batch id recorded
atomically with the version marker; one table belongs to one stream
lineage.  The table is version-directory swapped (see
``streaming/sketch_rollup.py``) so readers never see half-written state.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.windows import decayed_counts_at
from .sketch_rollup import _marker_state, _swap_in, read_versioned

_DECAYED_SCHEMA = (
    "key STRING, n_events LONG, wsum6 LONG, decayed_value6 LONG"
)


def decayed_rollup_writer(
    key: Column,
    ref_instant: str,
    table_path: str,
    ts_col: str = "ts",
    val_col: str = "value",
    half_life_s: int = 604800,
):
    """``foreachBatch`` function maintaining the decayed-sums table.

    Usage::

        stream.writeStream.foreachBatch(
            decayed_rollup_writer(
                F.col("event_type"), "2024-02-01 00:00:00", path
            )
        )
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(table_path, exist_ok=True)
        _, last_merged = _marker_state(table_path)
        if last_merged is not None and batch_id <= last_merged:
            return
        part = decayed_counts_at(
            batch_df.select(
                key.cast("string").alias("key"),
                F.col(ts_col).alias("ts"),
                F.col(val_col).alias("value"),
            ),
            ref_instant,
            key_col="key",
            ts_col="ts",
            val_col="value",
            half_life_s=half_life_s,
        )
        prev = read_decayed_table(spark, table_path)
        merged = (
            prev.unionByName(part)
            .groupBy("key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("wsum6").alias("wsum6"),
                F.sum("decayed_value6").alias("decayed_value6"),
            )
        ).localCheckpoint()
        _swap_in(merged, table_path, batch_id)

    return process


def read_decayed_table(spark: SparkSession, path: str) -> DataFrame:
    """Current decayed partials, or empty before the first batch."""
    return read_versioned(spark, path, _DECAYED_SCHEMA)


def decayed_asof(
    table: DataFrame, at_instant: str, ref_instant: str,
    half_life_s: int = 604800,
) -> DataFrame:
    """Serve the stored (exact, fixed-reference) partials as of a
    different instant: multiply by ``2^(-(at-ref)/half_life)`` — one
    scalar IEEE factor over |keys| rows.  The stored state stays exact;
    this view rounds exactly once at the edge."""
    age = F.expr(
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '{ref_instant}', TIMESTAMP_NTZ '{at_instant}')"
    )
    factor = F.pow(
        F.lit(2.0), -(age.cast("double") / F.lit(float(half_life_s) * 1e6))
    )
    return table.select(
        "key",
        "n_events",
        F.round(F.col("wsum6") * factor).cast("long").alias("wsum6"),
        F.round(F.col("decayed_value6") * factor)
        .cast("long")
        .alias("decayed_value6"),
    )
