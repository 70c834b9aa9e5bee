"""Time-window aggregations over the events stream table.

The reference has no event-time windows (processing-time timers only,
``WatermarkStrategy.noWatermarks()`` at ``job/InvoiceRequest.java:60-69``) —
these are the Spark-native extension a real analytics engine needs.  All
three window shapes run identically in batch (tested against DuckDB
oracles) and in Structured Streaming (add ``withWatermark`` upstream).

Scale notes: tumbling/sliding aggregations are single-shuffle hash
aggregates on (window, key) — the sliding form multiplies rows by
``duration/slide`` at the *map* side before partial aggregation, so keep
the ratio small at scale.  Session windows use Spark's native
``session_window`` (merging-state aggregate), which streams cleanly with
watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count/sum/avg per key."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events")
    )


def session_counts(
    df: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per key: events within ``gap`` of each other merge
    into one session."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def rate_spikes(
    events: DataFrame,
    spike_x: int = 3,
    trailing: int = 24,
    min_history: int = 12,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key event-RATE anomaly report: hours whose event count exceeds
    ``spike_x`` times the average over the trailing ``trailing`` observed
    hours — the monitoring query a continuous ingest runs to catch a
    crawler gone hot, a bot flood, or a replayed partition before it
    skews the training mix.

    Pure integer test (no IEEE division): spike ⇔ ``cnt * prev_n >
    spike_x * prev_sum`` over a ROWS window of the previous ``trailing``
    OBSERVED hours (rows, not range — gap hours carry no row, so the
    baseline is the activity level when the key was active; documented
    semantics, mirrored exactly in SQL).  Hours with fewer than
    ``min_history`` observed predecessor hours are warm-up and never
    flagged (an empty window would flag everything).

    Scale shape: one (key, hour)-keyed count aggregate (map-side
    combined — state bounded by keys × active hours, however many raw
    events stream through) and one KEYED window over those hourly rows
    — never a global sort, never a window over raw events.

    Output: (key, hr, cnt, prev_sum, prev_n) for flagged hours.
    """
    from pyspark.sql import Window

    hourly = events.groupBy(
        F.col(key_col).alias("k"), F.date_trunc("hour", F.col(ts_col)).alias("hr")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("k")
        .orderBy("hr")
        .rowsBetween(-int(trailing), -1)
    )
    flagged = (
        hourly.withColumn("prev_sum", F.sum("cnt").over(w))
        .withColumn("prev_n", F.count("cnt").over(w))
        .where(
            (F.col("prev_n") >= int(min_history))
            & (F.col("cnt") * F.col("prev_n") > int(spike_x) * F.col("prev_sum"))
        )
    )
    return flagged.select(
        F.col("k").alias(key_col), "hr", "cnt", "prev_sum", "prev_n"
    )
