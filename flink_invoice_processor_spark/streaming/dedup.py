"""Bounded cross-batch streaming dedup (reference operator K3, fixed).

The reference guards against re-delivery with a per-key ``Set<String>`` of
``{Type}_{id}_{sid}_{syncid}`` keys that is **never cleaned up**
(``InvoiceResponseBatchProcessor.java:29,110-121`` — state grows without
bound; SURVEY §2.4 flags it as a defect not to copy).  The Spark-native
replacement is ``dropDuplicatesWithinWatermark``: same observable behavior
inside the dedup horizon, state bounded by the watermark delay.

Batch paths use ``operators.response.dedup_records`` (plain
``dropDuplicates`` inside one micro-batch — re-polls can't re-emit rows
because the transactional log-and-delete sink removes processed rows and
the claim UPDATE hides in-flight retry rows).  This module is for true
streaming pipelines (e.g. the ``table_queue`` source), where duplicates
can span micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: The reference's composite dedup key columns
#: (InvoiceResponseRecordKeyGenerator.java:9-18).
DEDUP_KEY_COLS = ["record_type", "id", "sid", "syncid"]


def streaming_dedup(
    df: DataFrame,
    event_time_col: str = "created_date",
    delay: str = "10 minutes",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Drop duplicate records across micro-batches, keeping state only for
    ``delay`` past the watermark.

    ``delay`` is the dedup horizon: a duplicate arriving within ``delay``
    of the original's event time is dropped; later than that it would pass
    (and be caught by the idempotent delete-by-id sink).  The reference's
    horizon was "forever" at the cost of unbounded state.
    """
    keys = key_cols or DEDUP_KEY_COLS
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(keys)
