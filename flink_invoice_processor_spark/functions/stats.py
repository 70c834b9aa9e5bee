"""Exact distributed order statistics over integer-valued columns.

Spark's exact ``percentile`` aggregate buffers every value of a group in
executor memory — at 100 TB a single hot group OOMs the executor.  These
operators compute EXACT medians / quantile ranks the scale-safe way: as
selections over the per-group VALUE HISTOGRAM.

The pivot is ``groupBy(key, value).count()`` — one map-side-combined
shuffle whose output is bounded by the value-domain cardinality per key
(prices in cents, latencies in ms: thousands of distinct values no
matter how many billions of rows), not by the row count.  A running
cumulative count over that histogram turns any rank selection into a
conditional MIN:

    val_at(k) = MIN(value WHERE cum_count >= k)

Everything stays in integer arithmetic (rank thresholds are computed
with integer ceil-division; medians are carried as ``lower + upper``
sums, never divided), so results are engine-exact and every operator
here is DuckDB-oracle-checkable bit for bit.

No reference parity: the reference (Flink invoice jobs) has no
statistics surface; this is part of the Spark-native analytics
extension, same family as functions/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Column names the operators here introduce internally.  A KEY column
#: with one of these names would be silently shadowed mid-pipeline (the
#: same hazard curation.distributed_prefix_sum raises on), so every
#: entry point rejects it up front.
_RESERVED = frozenset({"val", "cnt", "cum", "n"})


def _check_key(key_col: str) -> None:
    if key_col in _RESERVED:
        raise ValueError(
            f"key_col {key_col!r} collides with an internal column of "
            f"functions/stats.py ({sorted(_RESERVED)}); rename the key "
            "column before calling"
        )


def _cum(hist: DataFrame, key_col: str, val_col: str = "val") -> DataFrame:
    """Running cumulative count over an existing (key, val, cnt)
    histogram.  The window runs over HISTOGRAM rows (bounded by the
    per-key value-domain cardinality), never over raw rows."""
    w = Window.partitionBy(key_col).orderBy(val_col)
    return hist.withColumn("cum", F.sum("cnt").over(w))


def value_histogram(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """The (key, val, cnt) value histogram every operator here pivots
    on — one map-side-combined shuffle.  Histograms MERGE by summing
    counts per (key, val), which makes them the exact-statistics
    analogue of a mergeable sketch: per-shard (or per-micro-batch)
    histograms can be built independently and summed, and quantiles
    computed from the merged histogram equal quantiles over the raw
    union (streaming/sketch_rollup.py maintains exactly that table)."""
    _check_key(key_col)
    return (
        df.select(F.col(key_col), F.col(val_col).alias("val"))
        .groupBy(key_col, "val")
        .agg(F.count("*").alias("cnt"))
    )


def _histogram(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """(key, val, cnt, cum) value histogram with a running cumulative
    count per key."""
    return _cum(value_histogram(df, key_col, val_col), key_col)


def _totals(hist: DataFrame, key_col: str) -> DataFrame:
    return hist.groupBy(key_col).agg(F.sum("cnt").alias("n"))


def grouped_median_mad(
    df: DataFrame, key_col: str, val_col: str
) -> DataFrame:
    """Exact per-key median and MAD (median absolute deviation) of an
    INTEGER value column, via two histogram passes.

    To stay in integers, the median is carried doubled — the classic
    even-count median ``(lower + upper) / 2`` becomes
    ``median_x2 = val_at(ceil(n/2)) + val_at(floor(n/2) + 1)`` (for odd
    ``n`` both ranks select the same row).  The second pass histograms
    the integer deviations ``dev = |2*val - median_x2|`` (= 2|v - med|)
    — crucially it re-aggregates the FIRST histogram, not the raw rows,
    so the deviation pass shuffles at most ``distinct(val)`` rows per
    key.  Its doubled median is ``mad_x4`` (= 4 * MAD).

    Output: (key, n, median_x2, mad_x4) — all BIGINT, engine-exact.
    The common robust-outlier test ``|v - med| > c * MAD`` becomes the
    integer predicate ``2 * |2*v - median_x2| > c * mad_x4``.
    """
    _check_key(key_col)
    hist = _histogram(
        df.select(F.col(key_col), F.col(val_col).alias("val")),
        key_col,
        "val",
    )
    totals = _totals(hist, key_col)
    # integer rank thresholds: k1 = ceil(n/2) = (n+1) div 2,
    # k2 = floor(n/2) + 1 = n div 2 + 1
    joined = hist.join(F.broadcast(totals), key_col)
    med = joined.groupBy(key_col, "n").agg(
        (
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n + 1) div 2"), F.col("val")
                )
            )
            + F.min(
                F.when(
                    F.col("cum") >= F.expr("n div 2 + 1"), F.col("val")
                )
            )
        ).alias("median_x2")
    )
    # deviation histogram FROM the first histogram (weighted by cnt)
    dev_hist = (
        hist.join(F.broadcast(med.select(key_col, "median_x2")), key_col)
        .select(
            key_col,
            F.abs(F.lit(2) * F.col("val") - F.col("median_x2")).alias(
                "val"
            ),
            F.col("cnt"),
        )
        .groupBy(key_col, "val")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wdev = Window.partitionBy(key_col).orderBy("val")
    dev_hist = dev_hist.withColumn("cum", F.sum("cnt").over(wdev))
    mad = (
        dev_hist.join(F.broadcast(totals), key_col)
        .groupBy(key_col, "n")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n + 1) div 2"),
                        F.col("val"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("cum") >= F.expr("n div 2 + 1"), F.col("val")
                    )
                )
            ).alias("mad_x4")
        )
    )
    return (
        med.join(mad.select(key_col, "mad_x4"), key_col)
        .select(key_col, F.col("n"), "median_x2", "mad_x4")
    )


def robust_outlier_counts(
    df: DataFrame,
    key_col: str,
    val_col: str,
    c: int = 3,
) -> DataFrame:
    """Per-key robust outlier summary: count of rows where
    ``|v - median| > c * MAD`` under the exact integer test of
    :func:`grouped_median_mad`.  The stats table is per-key-tiny and
    broadcast back onto the raw rows — one extra scan, no extra
    shuffle of the data.

    Output: (key, n, median_x2, mad_x4, n_outliers), all BIGINT.
    """
    _check_key(key_col)
    stats = grouped_median_mad(df, key_col, val_col)
    flagged = df.select(F.col(key_col), F.col(val_col).alias("val")).join(
        F.broadcast(stats), key_col
    )
    is_out = (
        F.lit(2) * F.abs(F.lit(2) * F.col("val") - F.col("median_x2"))
        > F.lit(c) * F.col("mad_x4")
    )
    return flagged.groupBy(key_col, "n", "median_x2", "mad_x4").agg(
        F.sum(is_out.cast("long")).alias("n_outliers")
    )


def grouped_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact per-key percentile report over an INTEGER value column —
    the p50/p90/p99 latency-dashboard shape — computed as
    ``percentile_disc``-style rank selections from the value histogram:
    ``p_X = val_at(ceil(X * n / 100))`` with pure-integer ceil division.
    One (key, val) shuffle + one histogram-sized window per key; no
    per-group buffering, no float interpolation.

    Output: (key, n, p<X> for each X) — all BIGINT, engine-exact.
    """
    _check_key(key_col)
    return quantiles_from_histogram(
        value_histogram(df, key_col, val_col), key_col, pcts
    )


def quantiles_from_histogram(
    hist: DataFrame,
    key_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """:func:`grouped_quantiles` over a pre-built (key, val, cnt)
    histogram — the read path for an incrementally-maintained histogram
    table (``streaming/sketch_rollup.histogram_rollup_writer``): because
    histograms merge exactly by count summation, quantiles selected
    from the maintained table equal quantiles over every raw row ever
    streamed through it."""
    _check_key(key_col)
    hist = _cum(hist, key_col)
    totals = _totals(hist, key_col)
    joined = hist.join(F.broadcast(totals), key_col)
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({p} * n + 99) div 100"),
                F.col("val"),
            )
        ).alias(f"p{p}")
        for p in pcts
    ]
    return joined.groupBy(key_col, "n").agg(*aggs)


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-key winsorized sum over an INTEGER value column: values are
    clamped to the exact empirical [lo_pct, hi_pct] percentile bounds
    before summation (the standard heavy-tail-robust aggregate).

    Percentile ranks are self-defined — ``k = ceil(pct * n / 100)``
    in pure integer arithmetic, bound = ``val_at(k)`` — rather than
    delegated to engine quantile functions whose tie/interpolation
    conventions differ.  Clamping and summation run over the HISTOGRAM
    (``sum(cnt * clamp(val))``), so after the one (key, val) shuffle
    nothing row-sized moves.

    Output: (key, n, lo_bound, hi_bound, winsorized_sum, raw_sum),
    all BIGINT, engine-exact.  The sums are bounded by ``n * max|val|``
    per key; a division-only ``assert_true`` guard (the dsir/pmi
    pattern — divisions cannot overflow, so the guard is sound at any
    width and any ANSI setting) proves that product fits int64 BEFORE
    the sums run, so exceeding the bound fails loudly instead of
    wrapping (ansi=off would otherwise wrap silently).
    """
    _check_key(key_col)
    hist = _histogram(
        df.select(F.col(key_col), F.col(val_col).alias("val")),
        key_col,
        "val",
    )
    totals = _totals(hist, key_col)
    joined = hist.join(F.broadcast(totals), key_col)
    bounds = joined.groupBy(key_col, "n").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({lo_pct} * n + 99) div 100"),
                F.col("val"),
            )
        ).alias("lo_bound"),
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({hi_pct} * n + 99) div 100"),
                F.col("val"),
            )
        ).alias("hi_bound"),
        F.max(F.abs(F.col("val"))).alias("_max_abs"),
    )
    _MAXL = 9223372036854775807
    guard = F.assert_true(
        F.col("_max_abs") <= F.expr(f"{_MAXL} div n"),
        F.lit(
            "winsorized_stats: sum bound n * max|val| exceeds int64 for "
            "this key — rescale the value units or shard and merge "
            "histograms"
        ),
    ).isNull()
    return (
        hist.join(F.broadcast(bounds), key_col)
        .where(guard)
        .groupBy(key_col, "n", "lo_bound", "hi_bound")
        .agg(
            F.sum(
                F.col("cnt")
                * F.greatest(
                    F.col("lo_bound"),
                    F.least(F.col("hi_bound"), F.col("val")),
                )
            ).alias("winsorized_sum"),
            F.sum(F.col("cnt") * F.col("val")).alias("raw_sum"),
        )
    )


def oof_target_encoding(
    df: DataFrame,
    key_col: str,
    fold_col: str,
    val_col: str,
) -> DataFrame:
    """Leakage-safe OUT-OF-FOLD target encoding: each row's category
    (``key_col``) is replaced by the mean target over all OTHER folds'
    rows of that category — the standard tabular-feature construction
    where using the row's own fold would leak its label into its
    feature (the feature-side complement of
    curation.leakage_safe_split).

    ``enc = (sum_key - sum_key_fold) div (n_key - n_key_fold)`` in
    integer truncating division (targets must be integers — cents, not
    floats — so both engines agree bit for bit).  A category seen ONLY
    in the row's own fold has no out-of-fold evidence and falls back to
    the fold-excluded GLOBAL prior (same formula over all rows), which
    is how unseen categories are scored at inference time too.

    Scale shape: one (key) and one (key, fold) map-side-combined
    aggregate joined back on their keys — two keyed shuffles of
    aggregate tables, never a row-level self-join; the n_folds-row
    global prior table broadcasts.

    Output: ``df``'s rows + ``enc`` (the fold column is the caller's
    ``fold_col``, already present) — enc NULL only if a fold held the
    entire dataset.
    """
    if "enc" in df.columns:
        raise ValueError(
            "oof_target_encoding: input column 'enc' collides with the"
            " output column; rename it first"
        )
    rows = df.select(
        "*",
        F.col(fold_col).alias("_fold"),
        F.col(val_col).alias("_t"),
    )
    by_key = rows.groupBy(key_col).agg(
        F.sum("_t").alias("_s_all"), F.count("*").alias("_n_all")
    )
    by_key_fold = rows.groupBy(key_col, "_fold").agg(
        F.sum("_t").alias("_s_f"), F.count("*").alias("_n_f")
    )
    g_all = rows.agg(F.sum("_t").alias("_gs"), F.count("*").alias("_gn"))
    g_fold = rows.groupBy("_fold").agg(
        F.sum("_t").alias("_gs_f"), F.count("*").alias("_gn_f")
    )
    prior = g_fold.crossJoin(F.broadcast(g_all)).select(
        "_fold",
        F.when(
            F.col("_gn") > F.col("_gn_f"),
            F.expr("(_gs - _gs_f) div (_gn - _gn_f)"),
        ).alias("_prior"),
    )
    return (
        rows.join(by_key, key_col)
        .join(by_key_fold, [key_col, "_fold"])
        .join(F.broadcast(prior), "_fold")
        .select(
            *df.columns,
            F.coalesce(
                F.when(
                    F.col("_n_all") > F.col("_n_f"),
                    F.expr("(_s_all - _s_f) div (_n_all - _n_f)"),
                ),
                F.col("_prior"),
            ).alias("enc"),
        )
    )


def auc_by_group(
    df: DataFrame,
    key_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-key ROC-AUC of an integer score against a boolean
    label — the classifier-eval loop a curation pipeline runs after
    every quality-model change (threshold-free, unlike the fixed-cut
    confusion counts).

    Computed as the Mann-Whitney U statistic with midrank tie handling
    (== the area under the trapezoidal ROC curve), but never via a
    per-row rank window: ranks come from the (key, score) value
    HISTOGRAM — for a score bucket of ``c`` rows starting after
    cumulative count ``cum_before``, the doubled midrank is
    ``2*cum_before + c + 1``, so the doubled positive-rank sum is one
    aggregate over histogram rows (bounded by the per-key distinct
    score count, the events_value_percentiles discipline).  All BIGINT:
    ``auc6 = (rs2 - n_pos*(n_pos+1)) * 1e6 div (2*n_pos*n_neg)``,
    engine-exact; NULL when a key has no positives or no negatives
    (AUC undefined).

    Output: (key, n_pos, n_neg, auc6)."""
    _check_key(key_col)
    hist = (
        df.select(
            F.col(key_col),
            F.col(score_col).alias("val"),
            F.col(label_col).cast("long").alias("_pos"),
        )
        .groupBy(key_col, "val")
        .agg(F.count("*").alias("cnt"), F.sum("_pos").alias("_c_pos"))
    )
    cum = _cum(hist, key_col)
    per = cum.groupBy(key_col).agg(
        F.sum(
            F.col("_c_pos")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("_rs2"),
        F.sum("_c_pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("_c_pos")).alias("n_neg"),
    )
    return per.select(
        key_col,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "(_rs2 - n_pos * (n_pos + 1)) * 1000000"
                " div (2 * n_pos * n_neg)"
            ),
        ).alias("auc6"),
    )


def calibration_report(
    df: DataFrame,
    key_col: str,
    score6_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-key reliability diagram over a micro-unit confidence score
    (``score6`` in [0, 1e6]): scores bucket into ``n_bins`` equal-width
    bins; each bin reports its size, mean confidence, empirical
    positive rate, and the |confidence − accuracy| gap — the per-bin
    terms of expected calibration error (ECE = Σ n·gap6 / N, left to
    the reader so the report stays per-bin).  Integer-exact end to
    end: ``mean_conf6 = sum_score6 div n``, ``pos_rate6 = n_pos * 1e6
    div n`` — one map-side-combined aggregate over (key, bin), never a
    sort.

    Output: (key, bin, n, mean_conf6, pos_rate6, gap6)."""
    _check_key(key_col)
    bin_c = F.expr(
        f"least({score6_col} * {int(n_bins)} div 1000000, {int(n_bins) - 1})"
    ).cast("long")
    per = (
        df.select(
            F.col(key_col),
            bin_c.alias("bin"),
            F.col(score6_col).alias("_s6"),
            F.col(label_col).cast("long").alias("_pos"),
        )
        .groupBy(key_col, "bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_s6").alias("_sum_s6"),
            F.sum("_pos").alias("n_pos"),
        )
    )
    mean_conf6 = F.expr("_sum_s6 div n")
    pos_rate6 = F.expr("n_pos * 1000000 div n")
    return per.select(
        key_col,
        "bin",
        "n",
        mean_conf6.alias("mean_conf6"),
        pos_rate6.alias("pos_rate6"),
        F.abs(mean_conf6 - pos_rate6).alias("gap6"),
    )


def cooccurrence_lift(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_both: int = 1,
) -> DataFrame:
    """Item co-occurrence lift over grouped baskets: for every pair of
    items appearing in the same group, ``lift6 = n_both * n_groups *
    1e6 div (n_a * n_b)`` (>1e6 ⇒ the pair co-occurs more than
    independence predicts), plus support and confidence in the same
    micro-units — the association-mining report (market baskets,
    event-type affinity, tag co-occurrence).

    Scale shape: the pair expansion is a self-join of the DISTINCT
    (group, item) rows on the group key — O(Σ_g d_g²) where ``d_g`` is
    the group's distinct-ITEM count, which is vocabulary-bounded
    (event types, brands), never row-count-bounded; item marginals and
    the group count are broadcast 1-row/side aggregates.

    Output: (item_a, item_b, n_a, n_b, n_both, support6, confidence6,
    lift6), item_a < item_b, confidence6 = P(b | a) in micro-units."""
    _check_key(group_col)
    gi = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    marg = gi.groupBy(F.col("_i").alias("item")).agg(
        F.count("*").alias("n_item")
    )
    n_groups = gi.select("_g").distinct().agg(
        F.count("*").alias("n_groups")
    )
    a, b = gi.alias("a"), gi.alias("b")
    both = (
        a.join(
            b,
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._i") < F.col("b._i")),
        )
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= min_both)
    )
    return (
        both.join(
            F.broadcast(marg.select(F.col("item").alias("item_a"),
                                    F.col("n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"),
                                    F.col("n_item").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_groups))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("n_both * 1000000 div n_groups").alias("support6"),
            F.expr("n_both * 1000000 div n_a").alias("confidence6"),
            F.expr(
                "n_both * n_groups * 1000000 div (n_a * n_b)"
            ).alias("lift6"),
        )
    )


def hourly_type_correlation(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Pairwise Pearson correlation between the hourly activity series
    of every two event types — the co-movement matrix behind "do
    errors spike when signups spike?" dashboards and behind pruning
    redundant signals from a feature set.

    Scale design: the corpus-sized work is ONE (hour, type) count
    aggregate (map-side combined; output bounded by hours x |types|,
    not rows).  The dense series — every type observed at every hour,
    zeros filled in — comes from the distinct-hour list broadcast-
    crossed with the |types|-row type list (both model-sized; the
    broadcast cross join is the lsh_blocking_audit pattern, never a
    shuffle cartesian).  Correlations are then ONE aggregate over the
    hour-joined pair expansion, bounded by hours x |types|^2/2 rows.

    Engine-exactness: all moments (n, Σx, Σy, Σxy, Σx², Σy²) are
    BIGINT-exact; the only floating arithmetic is the final
    ``num / sqrt(da * db)`` — cast, multiply, sqrt, divide are each
    IEEE-correctly-rounded, so identical bigint moments give the
    bit-identical double in Spark and DuckDB (no ln/exp in the
    expression).  NULL when either series is constant (undefined).

    Headroom (the gini_by_group discipline): the variance/covariance
    combinations ``n_hours·Σx² − (Σx)²`` are unchecked BIGINT — Spark
    (non-ANSI) wraps silently on overflow where DuckDB raises, so the
    caller must stay inside int64: with H hours and per-(hour, type)
    counts ≤ C, the largest term is ``H²·C²``, int64-safe while
    ``H·C < ~3e9`` (e.g. a full decade of hours, H≈8.8e4, allows
    C≈3.4e4 events per type-hour; a year allows C≈3.5e5).  Beyond
    that, pre-scale the counts (events → kilo-events) before calling,
    or recompute the combination in DECIMAL(38,0).

    Output: (type_a, type_b, n_hours, corr) with type_a < type_b."""
    cnt = (
        df.select(
            F.date_trunc("hour", F.col(ts_col)).alias("_hr"),
            F.col(type_col).alias("_ty"),
        )
        .groupBy("_hr", "_ty")
        .agg(F.count("*").alias("_c"))
    )
    hours = cnt.select("_hr").distinct()
    types = cnt.select("_ty").distinct()
    filled = (
        hours.crossJoin(F.broadcast(types))
        .join(cnt, ["_hr", "_ty"], "left")
        .select("_hr", "_ty", F.coalesce("_c", F.lit(0)).alias("x"))
    )
    a = filled.select(
        F.col("_hr"), F.col("_ty").alias("type_a"), F.col("x").alias("xa")
    )
    b = filled.select(
        F.col("_hr"), F.col("_ty").alias("type_b"), F.col("x").alias("xb")
    )
    moments = (
        a.join(b, "_hr")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("xa").alias("_sx"),
            F.sum("xb").alias("_sy"),
            F.sum(F.col("xa") * F.col("xb")).alias("_sxy"),
            F.sum(F.col("xa") * F.col("xa")).alias("_sxx"),
            F.sum(F.col("xb") * F.col("xb")).alias("_syy"),
        )
    )
    return moments.select(
        "type_a",
        "type_b",
        "n_hours",
        F.expr(
            "CASE WHEN n_hours * _sxx - _sx * _sx = 0"
            "       OR n_hours * _syy - _sy * _sy = 0 THEN NULL"
            " ELSE CAST(n_hours * _sxy - _sx * _sy AS DOUBLE)"
            "      / sqrt(CAST(n_hours * _sxx - _sx * _sx AS DOUBLE)"
            "             * CAST(n_hours * _syy - _sy * _sy AS DOUBLE))"
            " END"
        ).alias("corr"),
    )


def psi_report(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bin_width: int = 10,
    n_bins: int = 10,
    base_days: int = 7,
) -> DataFrame:
    """Population Stability Index per key: how far the value
    distribution of the CURRENT period drifted from the BASE period
    (first ``base_days`` days of the stream) — the industry-standard
    go/no-go drift score for deployed model inputs (PSI < 0.1 stable,
    > 0.25 retrain), here over fixed-width value bins with an overflow
    top bin.

    Scale design: one scan computes the global min timestamp (1-row
    aggregate, broadcast back — the events_gap_fill bounds pattern);
    one (type, bin, period) count aggregate bounds everything after it
    by |types| x n_bins rows.  The dense bin grid (zero cells matter:
    with Laplace +1 smoothing a bin empty in both periods still
    contributes when the period sizes differ) is |types| rows exploded
    by a constant 0..n_bins-1 sequence — pure map, no join.

    Engine-exactness: shares (p6, q6) are integer micro-units with
    Laplace +1/(n+B) smoothing, clamped to >=1 micro-unit so a share
    that would truncate to 0 (possible once a period holds >~1M rows
    per type) can never feed ln a zero — BIGINT-exact.  Each bin's term
    ``(p-q) * ln(p/q)`` is ONE double expression over those exact
    integers, floored to integer micro-units BEFORE the per-type sum,
    so the sum is order-free integer arithmetic (the bm25 ln
    precedent, hardened: a last-ULP ln disagreement would have to
    cross a floor boundary to surface).

    Output: (key, n_base, n_curr, psi_micro) — psi_micro is PSI in
    millionths."""
    mints = df.agg(F.min(ts_col).alias("_mints"))
    binned = (
        df.crossJoin(F.broadcast(mints))
        .select(
            F.col(type_col).alias("_ty"),
            F.least(
                F.greatest(
                    F.floor(F.col(value_col) / bin_width).cast("long"),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).alias("bin"),
            (
                F.col(ts_col)
                < F.expr(f"_mints + INTERVAL {base_days} DAY")
            ).alias("_is_base"),
        )
        .groupBy("_ty", "bin")
        .agg(
            F.sum(F.col("_is_base").cast("long")).alias("_cb"),
            F.sum((~F.col("_is_base")).cast("long")).alias("_cc"),
        )
    )
    totals = binned.groupBy("_ty").agg(
        F.sum("_cb").alias("n_base"), F.sum("_cc").alias("n_curr")
    )
    grid = totals.select(
        "_ty",
        "n_base",
        "n_curr",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    # clamp each share to >=1 micro-unit: once a period exceeds ~1e6
    # rows per type, an (almost-)empty bin's smoothed share truncates
    # to 0 micro-units and ln(p/q) would be ln(0)/x-over-0 — Spark
    # NULLs the term (silently understating PSI) while DuckDB raises.
    # The clamp keeps every cell defined at ANY n, mirrored verbatim
    # in the oracle SQL and the tests' Python model.  Precision
    # headroom: micro-unit shares quantize at 1e-6, so bins below that
    # share read as 1 micro-unit — adequate for a 10-bin drift score;
    # use nano-units if a future caller needs finer shares (int64
    # holds (cnt+1)*1e9 while cnt < ~9.2e9 rows per (type, bin)).
    cells = grid.join(binned, ["_ty", "bin"], "left").select(
        "_ty",
        "n_base",
        "n_curr",
        F.expr(
            f"greatest((coalesce(_cb, 0) + 1) * 1000000"
            f" div (n_base + {n_bins}), 1)"
        ).alias("_p6"),
        F.expr(
            f"greatest((coalesce(_cc, 0) + 1) * 1000000"
            f" div (n_curr + {n_bins}), 1)"
        ).alias("_q6"),
    )
    terms = cells.select(
        "_ty",
        "n_base",
        "n_curr",
        F.expr(
            "CAST(floor((CAST(_p6 - _q6 AS DOUBLE) / 1000000.0)"
            " * ln(CAST(_p6 AS DOUBLE) / CAST(_q6 AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("_t"),
    )
    return (
        terms.groupBy("_ty", "n_base", "n_curr")
        .agg(F.sum("_t").alias("psi_micro"))
        .select(
            F.col("_ty").alias(type_col), "n_base", "n_curr", "psi_micro"
        )
    )


def gini_by_group(
    df: DataFrame,
    key_col: str,
    val_col: str,
) -> DataFrame:
    """Exact per-key Gini coefficient of a non-negative integer value —
    the concentration/inequality score behind dataset-balance audits
    ("is one crawl dump contributing 90% of source X's tokens?"),
    revenue-concentration dashboards, and Lorenz curves.

    Computed from the (key, value) HISTOGRAM, never a per-row rank
    window: with values sorted ascending, ``G = (2·Σ rank_i·x_i −
    (n+1)·Σx) / (n·Σx)`` where tied values take their MIDRANK — the
    identical doubled-midrank-from-cumulative-counts trick as
    ``auc_by_group`` (for a bucket of ``c`` rows after cumulative count
    ``cum_before``, the doubled rank sum factor is ``2·cum_before + c
    + 1``), so the whole statistic is one aggregate over histogram
    rows, bounded by the per-key value-domain cardinality.  All BIGINT
    (``gini6`` in micro-units); by Chebyshev's sum inequality the
    numerator is non-negative, so truncating division agrees between
    engines.  NULL when the value sum is zero (Gini undefined).

    Headroom: the micro-unit numerator is ``(B2 − (n+1)·S)·1e6`` with
    ``B2 ≤ 2n·S`` — int64-safe while ``n·S < ~4.6e12`` per key (e.g.
    10⁶ docs averaging 4.6k chars per key); beyond that, rescale the
    value units (chars → kchars) before calling.

    Output: (key, n, sum_val, gini6)."""
    _check_key(key_col)
    hist = (
        df.select(F.col(key_col), F.col(val_col).alias("val"))
        .groupBy(key_col, "val")
        .agg(F.count("*").alias("cnt"))
    )
    cum = _cum(hist, key_col)
    g = cum.groupBy(key_col).agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("val") * F.col("cnt")).alias("sum_val"),
        F.sum(
            F.col("cnt")
            * F.col("val")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("_b2"),
    )
    return g.select(
        key_col,
        "n",
        "sum_val",
        F.when(
            F.col("sum_val") > 0,
            F.expr(
                "(_b2 - (n + 1) * sum_val) * 1000000 div (n * sum_val)"
            ),
        ).alias("gini6"),
    )
