"""Unit tests for the round-12 batch operators (exact per-group Gini
concentration, pairwise hourly-series correlation, PSI drift report) —
pinned against independent Python models and hand-built cases, beyond
their DuckDB oracle rows at one dataset."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import Row

from flink_invoice_processor_spark.functions import stats as ST


# ---------------------------------------------------------------------------
# gini_by_group
# ---------------------------------------------------------------------------


def _gini_df(spark, rows):
    return spark.createDataFrame(
        [Row(source=s, n_chars=v) for s, v in rows],
        "source string, n_chars long",
    )


def _gini(spark, rows):
    return {
        r.source: (r.n, r.sum_val, r.gini6)
        for r in ST.gini_by_group(
            _gini_df(spark, rows), "source", "n_chars"
        ).collect()
    }


def _py_gini6(vals):
    """Independent midrank model: sort, doubled-rank-weighted sum."""
    n, s = len(vals), sum(vals)
    if s == 0:
        return None
    b2 = 0
    cum = 0
    from collections import Counter

    cnt = Counter(vals)
    for v in sorted(cnt):
        c = cnt[v]
        b2 += c * v * (2 * cum + c + 1)
        cum += c
    return (b2 - (n + 1) * s) * 1000000 // (n * s)


def test_gini_known_values(spark):
    got = _gini(spark, [("a", 0), ("a", 1)])
    assert got["a"] == (2, 1, 500000)      # Gini([0, 1]) = 0.5 exactly


def test_gini_equal_values_zero_and_zero_sum_null(spark):
    got = _gini(spark, [("eq", 7)] * 5 + [("z", 0), ("z", 0)])
    assert got["eq"] == (5, 35, 0)
    assert got["z"] == (2, 0, None)        # undefined on zero mass


def test_gini_matches_python_model_with_ties(spark):
    vals = [3, 3, 10, 1, 7, 7, 7, 100, 2, 5]
    other = [40, 1, 1, 9]
    got = _gini(spark, [("x", v) for v in vals] + [("y", v) for v in other])
    assert got["x"] == (len(vals), sum(vals), _py_gini6(vals))
    assert got["y"] == (len(other), sum(other), _py_gini6(other))


def test_gini_extreme_concentration(spark):
    # one doc owns all the mass: G = (n-1)/n
    vals = [0] * 9 + [1000]
    got = _gini(spark, [("c", v) for v in vals])
    assert got["c"] == (10, 1000, 900000)


# ---------------------------------------------------------------------------
# hourly_type_correlation
# ---------------------------------------------------------------------------

_T0 = datetime(2024, 1, 1, 0, 30, 0)


def _events(spark, counts_by_type):
    """counts_by_type: {type: [count in hour 0, hour 1, ...]}."""
    rows = []
    eid = 0
    for ty, series in counts_by_type.items():
        for h, c in enumerate(series):
            for _ in range(c):
                rows.append(Row(event_id=eid, ts=_T0 + timedelta(hours=h),
                                event_type=ty, value=1.0))
                eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, event_type string, value double",
    )


def _corr(spark, counts_by_type):
    return {
        (r.type_a, r.type_b): (r.n_hours, r.corr)
        for r in ST.hourly_type_correlation(
            _events(spark, counts_by_type)
        ).collect()
    }


def test_corr_proportional_series_is_exactly_one(spark):
    got = _corr(spark, {"a": [1, 2, 3], "b": [2, 4, 6]})
    assert got == {("a", "b"): (3, 1.0)}


def test_corr_constant_series_is_null(spark):
    got = _corr(spark, {"a": [1, 2, 3], "c": [2, 2, 2]})
    assert got[("a", "c")] == (3, None)


def test_corr_zero_fill_and_python_model(spark):
    # type d is absent from hours 0-1: the dense grid must see [0, 0, 3],
    # not a 1-point series
    series = {"a": [1, 2, 3], "d": [0, 0, 3]}
    got = _corr(spark, series)
    x, y = series["a"], series["d"]
    n = len(x)
    num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    da = n * sum(a * a for a in x) - sum(x) ** 2
    db = n * sum(b * b for b in y) - sum(y) ** 2
    expect = num / math.sqrt(da * db)
    n_hours, corr = got[("a", "d")]
    assert n_hours == 3
    assert abs(corr - expect) < 1e-12


# ---------------------------------------------------------------------------
# psi_report
# ---------------------------------------------------------------------------


def _psi_events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, event_type=ty, value=v)
         for i, (ts, ty, v) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, event_type string, value double",
    )


def _py_psi_micro(base_bins, curr_bins, n_bins=10):
    """Independent model: Laplace-smoothed micro-unit shares clamped
    to >=1 (so ln never sees a truncated-to-zero share at large n),
    per-bin terms floored to micro-units, integer sum."""
    n_b, n_c = sum(base_bins), sum(curr_bins)
    total = 0
    for cb, cc in zip(base_bins, curr_bins):
        p6 = max((cb + 1) * 1000000 // (n_b + n_bins), 1)
        q6 = max((cc + 1) * 1000000 // (n_c + n_bins), 1)
        total += math.floor(((p6 - q6) / 1000000.0)
                            * math.log(p6 / q6) * 1000000.0)
    return total


def test_psi_identical_distributions_is_zero(spark):
    rows = []
    for day in (0, 10):   # one base batch, one current batch, same shape
        for v in (5.0, 5.0, 15.0, 25.0):
            rows.append((_T0 + timedelta(days=day), "a", v))
    out = {r.event_type: r for r in ST.psi_report(
        _psi_events(spark, rows)).collect()}
    r = out["a"]
    assert (r.n_base, r.n_curr) == (4, 4)
    # equal n and identical bin counts: p6 == q6 in every cell, ln(1) = 0
    assert r.psi_micro == 0


def test_psi_shifted_distribution_matches_python_model(spark):
    rows = []
    base_bins = [0] * 10
    curr_bins = [0] * 10
    for _ in range(10):
        rows.append((_T0, "a", 5.0))            # bin 0, base week
        base_bins[0] += 1
    for _ in range(7):
        rows.append((_T0 + timedelta(days=9), "a", 15.0))   # bin 1, current
        curr_bins[1] += 1
    for _ in range(3):
        rows.append((_T0 + timedelta(days=9), "a", 999.0))  # overflow bin 9
        curr_bins[9] += 1
    r = ST.psi_report(_psi_events(spark, rows)).collect()[0]
    assert (r.n_base, r.n_curr) == (10, 10)
    assert r.psi_micro == _py_psi_micro(base_bins, curr_bins)
    assert r.psi_micro > 250000   # a full bin shift reads as "retrain"


def test_psi_truncated_share_clamps_instead_of_null(spark):
    """The >~1M-rows-per-type failure mode (r12 ADVICE), made reachable
    with tiny data by inflating n_bins: the smoothing denominator
    n + n_bins exceeds 1e6, so an empty bin's share truncates to 0
    micro-units — pre-clamp that fed ln a zero (Spark NULLed the term,
    DuckDB errored).  With the clamp the term is finite, non-NULL, and
    matches a clamped Python model bin-for-bin."""
    n_bins = 1_100_000
    rows = ([(_T0, "a", 5.0)] * 4            # base: 4 rows in bin 0
            + [(_T0 + timedelta(days=9), "a", 15.0)] * 3)  # curr: bin 1
    r = ST.psi_report(
        _psi_events(spark, rows), n_bins=n_bins, bin_width=10
    ).collect()[0]
    assert (r.n_base, r.n_curr) == (4, 3)
    assert r.psi_micro is not None
    # model: every empty-in-both bin clamps to p6=q6=1 -> term 0, so
    # only bins 0 and 1 contribute
    def share(c, n):
        return max((c + 1) * 1000000 // (n + n_bins), 1)
    expect = 0
    for cb, cc in ((4, 0), (0, 3)):
        p6, q6 = share(cb, 4), share(cc, 3)
        expect += math.floor(
            ((p6 - q6) / 1000000.0) * math.log(p6 / q6) * 1000000.0
        )
    assert r.psi_micro == expect
    assert r.psi_micro > 0


def test_psi_boundary_day_seven_is_current(spark):
    rows = [(_T0, "a", 5.0),
            (_T0 + timedelta(days=7), "a", 5.0)]   # exactly min+7d: current
    r = ST.psi_report(_psi_events(spark, rows)).collect()[0]
    assert (r.n_base, r.n_curr) == (1, 1)
