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


def decayed_counts(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    half_life_s: int = 86400,
) -> DataFrame:
    """Exponentially time-decayed aggregates per key — the feature-store
    staple ("activity in the recent past, old events fading smoothly")
    that replaces a fan of fixed lookback windows with ONE scan: each
    row contributes ``value · 2^(-Δ/half_life)`` where Δ is its age in
    seconds against the corpus max timestamp.

    Decayed sums are mergeable the same way sketches are (partials
    decayed to a common reference instant just add), which is why this
    aggregates map-side like a plain sum.  Exactness contract: the
    per-row decay weight is one fixed IEEE expression rounded to 1e-6
    micro-units, and the aggregate SUMS THE BIGINT micro-units exactly —
    never doubles — so partial-aggregation order can't shift the result.
    The reference instant comes from a 1-row max-timestamp aggregate
    broadcast-cross-joined back (no window, no second scan of raw rows
    beyond the max).

    Output: (key, n_events, wsum6, decayed_value6) — decayed row count
    and decayed value sum in micro-units."""
    tmax = df.agg(F.max(ts_col).alias("_tref"))
    return _decayed_agg(
        df.crossJoin(F.broadcast(tmax)), key_col, ts_col, val_col,
        half_life_s,
    )


def decayed_counts_at(
    df: DataFrame,
    ref_instant: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    half_life_s: int = 86400,
) -> DataFrame:
    """:func:`decayed_counts` decayed to a FIXED reference instant (an
    ISO timestamp string) instead of the corpus max — the form whose
    micro-unit partials are EXACTLY mergeable across any split of the
    rows (same instant → partials just add; the data-derived max can
    differ between splits).  ``streaming/decayed_rollup.py`` maintains
    this table across micro-batches and the batch/stream parity is bit
    for bit BECAUSE both sides call this one function.  Events after
    the instant get weights > 1 (2^(+Δ/half-life)) — well-defined, and
    exact ONLY while the micro-unit weight stays inside the integer-
    exact double range: 2^(Δ/half-life)·1e6 < 2^53, i.e. events no more
    than ~33.07 half-lives past the instant (and past ~63 half-lives
    the non-ANSI double→long cast saturates outright).  Choose
    ``ref_instant`` at-or-after the data's max timestamp — the intended
    use — and the bound is never approached; far-future timestamps
    beyond it break the exact-mergeable-partials contract."""
    j = df.withColumn(
        "_tref", F.lit(ref_instant).cast("timestamp_ntz")
    )
    return _decayed_agg(j, key_col, ts_col, val_col, half_life_s)


def _decayed_agg(
    j: DataFrame, key_col: str, ts_col: str, val_col: str, half_life_s: int
) -> DataFrame:
    """Shared decay algebra over a frame carrying ``_tref``: one fixed
    IEEE weight expression per row, rounded to micro-units, summed
    exactly as BIGINT."""
    # exact integer microseconds (timestamps carry sub-second precision;
    # SECOND-granularity diffs are boundary counts and engine-ambiguous)
    age = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _tref)")
    w = F.pow(
        F.lit(2.0), -(age.cast("double") / F.lit(float(half_life_s) * 1e6))
    )
    return (
        j.select(
            F.col(key_col),
            F.round(w * F.lit(1000000.0)).cast("long").alias("_w6"),
            F.round(F.col(val_col) * w * F.lit(1000000.0))
            .cast("long")
            .alias("_vw6"),
        )
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_w6").alias("wsum6"),
            F.sum("_vw6").alias("decayed_value6"),
        )
    )


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Last-touch revenue attribution: every conversion event's value is
    credited to the user's most recent STRICTLY-preceding
    non-conversion event type ('direct' when there is none) — the
    marketing-analytics staple, and the windowed-analytics shape
    (conditional last-over-preceding-rows) Spark expresses without a
    self-join.

    One window per user ordered by the (ts, event_id) total order —
    per-key state is the user's own history, never corpus-wide; revenue
    sums in exact integer cents (values carry 2 decimals).

    Output: (channel, n_conversions, revenue_cents)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chan = F.last(
        F.when(F.col(type_col) != conversion_type, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.withColumn("_chan", chan)
        .where(F.col(type_col) == conversion_type)
        .select(
            F.coalesce(F.col("_chan"), F.lit("direct")).alias("channel"),
            F.round(F.col(val_col) * F.lit(100.0)).cast("long").alias("_c"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            F.sum("_c").alias("revenue_cents"),
        )
    )


def seasonality_profile(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    hot_factor: int = 2,
) -> DataFrame:
    """Hour-of-WEEK seasonality profile per key: counts on the (day of
    week, hour of day) calendar grid, each cell's share of the key's
    total in micro-units, and a ``hot`` flag for cells above
    ``hot_factor``× the key's mean populated-cell load — the calendar
    complement of the trailing-window ``rate_spikes`` detector
    (recurring load shape vs transient anomaly).

    Scale shape: ONE map-side-combined aggregate onto the ≤ |keys|·168
    cell grid; totals and cell counts re-aggregate those grid rows, and
    the flag is a pure integer comparison (cnt · n_cells > factor ·
    total) — no division, no doubles, no window over raw events.
    Decade measurements sit at ~0.2-0.3 s absolute deltas for 10× events
    (the grid is size-capped, so only the scan grows); ratios there are
    fixed-overhead-dominated, not shape signals.

    Output: (key, dow, hour, cnt, share6, hot)."""
    cells = (
        df.select(
            F.col(key_col),
            F.dayofweek(ts_col).alias("dow"),
            F.hour(ts_col).alias("hour"),
        )
        .groupBy(key_col, "dow", "hour")
        .agg(F.count("*").alias("cnt"))
    )
    totals = cells.groupBy(key_col).agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_n_cells")
    )
    j = cells.join(totals, key_col)
    return j.select(
        F.col(key_col),
        F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "cnt",
        F.expr("(2000000 * cnt + _total) div (2 * _total)").alias("share6"),
        (
            F.col("cnt") * F.col("_n_cells")
            > F.lit(hot_factor) * F.col("_total")
        ).alias("hot"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "1 hour",
    h_mult: int = 3,
) -> DataFrame:
    """Per-key CUSUM change-point detection over event-time buckets —
    the streaming-monitoring staple (Page 1954): a sustained shift in a
    key's arrival rate accumulates in the CUSUM statistic long before
    any single bucket clears a spike threshold (``rate_spikes`` catches
    spikes; this catches drifts).

    The textbook recurrence s_t = max(0, s_{t-1} + (x_t - mu)) is a
    loop-carried max — but it has a closed window form:
    ``s_t = P_t - min_{j<=t} P_j`` where P is the prefix sum of
    (x_t - mu).  Both the prefix sum and the prefix min are plain
    ordered-window aggregates, so the whole operator is two window
    passes over the per-key BUCKET rows (bounded by the time domain,
    never the raw events).  The negative side uses the mirror
    ``max prefix - P``.

    Exactness: mu = total/n_buckets is rational, so everything is
    scaled by n_buckets and stays BIGINT — d_t = n*x_t - total,
    P/s are exact integers, and the change flag compares against
    ``h_mult * total`` (= h_mult * mean * n, i.e. the drift must
    accumulate h_mult mean-bucket-counts of excess) with no division
    anywhere.

    Output: (key, window_start, n_events, cusum_pos_num, cusum_neg_num,
    is_changepoint) — *_num are the n-scaled CUSUM values.

    Decade-scale evidence (SCALING_r10): steady 0.28 → 0.60 s (2.12×)
    at a 0.32 s delta — the window input is the (key, bucket) grid,
    whose size is time-domain-bounded and grows far slower than the
    raw events, so the reading is the fixed per-query overhead plus a
    grid that barely moved (the seasonality-profile precedent).
    """
    from pyspark.sql import Window

    b = (
        df.select(
            F.col(key_col),
            F.window(ts_col, bucket).alias("_w"),
        )
        .groupBy(key_col, F.col("_w.start").alias("window_start"))
        .agg(F.count("*").alias("n_events"))
    )
    tot = b.groupBy(key_col).agg(
        F.sum("n_events").alias("_total"), F.count("*").alias("_nb")
    )
    j = b.join(F.broadcast(tot), key_col).withColumn(
        "_d", F.col("_nb") * F.col("n_events") - F.col("_total")
    )
    w = Window.partitionBy(key_col).orderBy("window_start")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j = j.withColumn("_p", F.sum("_d").over(run))
    j = j.withColumn("_pmin", F.min("_p").over(run)).withColumn(
        "_pmax", F.max("_p").over(run)
    )
    return j.select(
        F.col(key_col),
        "window_start",
        "n_events",
        (F.col("_p") - F.col("_pmin")).alias("cusum_pos_num"),
        (F.col("_pmax") - F.col("_p")).alias("cusum_neg_num"),
        (
            (F.col("_p") - F.col("_pmin") > F.lit(h_mult) * F.col("_total"))
            | (F.col("_pmax") - F.col("_p") > F.lit(h_mult) * F.col("_total"))
        ).alias("is_changepoint"),
    )


def session_sequences(
    df: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    sep: str = ">",
) -> DataFrame:
    """Training-sequence export from sessionized events: each (user,
    session) becomes one ordered action string — the behavioral-LM /
    next-action-model input format (user histories cut at ``gap``
    inactivity, actions joined in event-time order).

    One user_id window finds the session breaks (lag + cumulative sum —
    the same shape ``session_counts`` gates against session_window),
    then one hash aggregate per session collects the (ts, event_id,
    type) structs and sorts WITHIN the session — per-group state is one
    session's own events, never corpus-wide, and the (ts, event_id)
    total order makes the sequence deterministic under ties.

    Output: (user_id, session_start, n_events, event_seq).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    gap_expr = F.expr(f"INTERVAL {gap}")
    brk = (
        F.when(
            F.col(ts_col)
            <= F.lag(ts_col).over(w) + gap_expr,
            F.lit(0),
        )
        .otherwise(F.lit(1))
    )
    s = df.withColumn("_brk", brk).withColumn(
        "_sess",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        s.groupBy(key_col, "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count("*").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("ts"),
                                F.col("event_id").alias("event_id"),
                                F.col(type_col).alias("t"),
                            )
                        )
                    ),
                    lambda x: x["t"],
                ),
                sep,
            ).alias("event_seq"),
        )
        .drop("_sess")
    )


def watermark_drop_report(
    df: DataFrame,
    delay: str = "10 minutes",
    key_col: str = "event_type",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Batch-equivalent audit of event-time WATERMARK semantics (the
    Flink/Structured-Streaming late-data contract the reference's
    DataStream jobs run under): replaying the keyed stream in arrival
    order (``arrival_col`` — ids are assigned on arrival), an element
    is DROPPED if its event time is already more than ``delay`` behind
    the maximum event time among its strict predecessors on the same
    key — exactly the bounded-out-of-orderness watermark rule, per
    keyed stream.

    Use it to SIZE the delay before deploying the streaming job: run at
    a few candidate delays, read the drop counts and the worst observed
    lateness.  One per-key ordered window (running max over preceding
    rows, self excluded — an element can never drop itself), one
    aggregate; lateness in exact integer microseconds.

    Output: (key, n_events, n_dropped, n_kept, max_late_us).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = F.max(ts_col).over(w) - F.expr(f"INTERVAL {delay}")
    j = df.withColumn("_wm", wm).withColumn(
        "_late_us",
        F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _wm)"),
    )
    dropped = F.col("_wm").isNotNull() & (F.col("_late_us") > 0)
    return j.groupBy(key_col).agg(
        F.count("*").alias("n_events"),
        F.sum(dropped.cast("long")).alias("n_dropped"),
        F.sum((~dropped).cast("long")).alias("n_kept"),
        F.max(F.when(dropped, F.col("_late_us"))).alias("max_late_us"),
    )
