"""Unit tests for the round-12 batch operators (edit-distance-verified
near-dup pairs, pairwise hourly-series correlation, PSI drift report) —
pinned against independent Python models and hand-built cases, beyond
their DuckDB oracle rows at one dataset."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import Row

from flink_invoice_processor_spark.functions import dedup as DD
from flink_invoice_processor_spark.functions import stats as ST


# ---------------------------------------------------------------------------
# edit_distance_pairs
# ---------------------------------------------------------------------------

_PREFIX = "the quick brown fox jumps over the lazy dog "  # 45 chars


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=lg, text=t) for i, lg, t in rows],
        "doc_id long, lang string, text string",
    )


def _pairs(spark, rows, **kw):
    return {
        (r.doc_id_a, r.doc_id_b, r.lev)
        for r in DD.edit_distance_pairs(_docs(spark, rows), **kw).collect()
    }


def test_edit_pairs_exact_and_near(spark):
    base = _PREFIX + "sells seashells by the seashore every day"
    rows = [
        (1, "en", base),
        (2, "en", base),                      # exact dup: lev 0
        (3, "en", base.replace("every", "most")),  # small edit
        (4, "en", "completely different opening sentence here okay"),
    ]
    got = _pairs(spark, rows)
    # levenshtein("every", "most") within identical context: 4 subs + 1 del
    assert (1, 2, 0) in got
    assert (1, 3, 5) in got and (2, 3, 5) in got
    assert not any(4 in (a, b) for a, b, _ in got)


def test_edit_pairs_blocking_keys(spark):
    base = _PREFIX + "one two three four five six seven eight nine"
    rows = [
        (1, "en", base),
        (2, "de", base),               # same text, other lang: blocked apart
        (3, "en", base + " " + "x" * 80),  # same prefix, length bucket differs
    ]
    assert _pairs(spark, rows) == set()


def test_edit_pairs_max_dist_and_empty(spark):
    base = _PREFIX + "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "en", base),
        (2, "en", _PREFIX + "totally rewritten tail that shares nothing x"),
        (3, "en", "   "),
        (4, "en", "   "),              # blank pair must NOT appear
    ]
    got = _pairs(spark, rows)
    assert not any({3, 4} & {a, b} for a, b, _ in got)
    assert got == set()                # lev(1,2) > 16: verified away
    # a looser threshold admits the same candidate pair
    loose = _pairs(spark, rows, max_dist=100)
    assert {(a, b) for a, b, _ in loose} == {(1, 2)}


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_pairs_distance_matches_python_model(spark):
    base = _PREFIX + "round trip latency is dominated by the shuffle"
    variants = [
        base,
        base.replace("latency", "runtime"),
        base.replace("shuffle", "scan") + " tail",
    ]
    rows = [(i, "en", t) for i, t in enumerate(variants)]
    got = _pairs(spark, rows, max_dist=64)
    for a, b, lev in got:
        assert lev == _py_lev(variants[a][:256], variants[b][:256])
    assert len(got) == 3


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
    """Independent model: Laplace-smoothed micro-unit shares, per-bin
    terms floored to micro-units, integer sum."""
    n_b, n_c = sum(base_bins), sum(curr_bins)
    total = 0
    for cb, cc in zip(base_bins, curr_bins):
        p6 = (cb + 1) * 1000000 // (n_b + n_bins)
        q6 = (cc + 1) * 1000000 // (n_c + n_bins)
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


def test_psi_boundary_day_seven_is_current(spark):
    rows = [(_T0, "a", 5.0),
            (_T0 + timedelta(days=7), "a", 5.0)]   # exactly min+7d: current
    r = ST.psi_report(_psi_events(spark, rows)).collect()[0]
    assert (r.n_base, r.n_curr) == (1, 1)
