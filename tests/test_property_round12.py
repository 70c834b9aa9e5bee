"""Property-based checks of the round-12 operators against pure-Python
models: hypothesis generates small corpora/series/event streams, a
reference model computes the exact expected result, one Spark job per
example compares.  Pins the semantics the DuckDB oracles only sample at
one dataset."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from flink_invoice_processor_spark.functions import stats as ST

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = datetime(2024, 3, 1, 0, 15, 0)


# --------------------------------------------------------------------------
# gini_by_group == midrank model; bounded; scale-invariant
# --------------------------------------------------------------------------


def _py_gini6(vals):
    n, s = len(vals), sum(vals)
    if s == 0:
        return None
    b2, cum = 0, 0
    cnt = Counter(vals)
    for v in sorted(cnt):
        c = cnt[v]
        b2 += c * v * (2 * cum + c + 1)
        cum += c
    return (b2 - (n + 1) * s) * 1000000 // (n * s)


@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.integers(0, 500), min_size=1, max_size=12),
        min_size=1,
        max_size=3,
    ),
    scale=st.sampled_from([1, 7]),
)
@settings(**_SETTINGS)
def test_gini_matches_model_bounded_and_scale_invariant(
    spark, groups, scale
):
    rows = [
        Row(source=g, n_chars=v * scale)
        for g, vals in groups.items()
        for v in vals
    ]
    got = {
        r.source: (r.n, r.sum_val, r.gini6)
        for r in ST.gini_by_group(
            spark.createDataFrame(rows, "source string, n_chars long"),
            "source",
            "n_chars",
        ).collect()
    }
    assert set(got) == set(groups)
    for g, vals in groups.items():
        n, sum_v, gini6 = got[g]
        assert (n, sum_v) == (len(vals), sum(vals) * scale)
        # multiplying every value by a constant scales B2 and S alike,
        # so the truncated ratio is EXACTLY unchanged — the Spark
        # number must equal the unscaled python model
        assert gini6 == _py_gini6(vals)
        if gini6 is not None:
            assert 0 <= gini6 < 1000000


# --------------------------------------------------------------------------
# hourly_type_correlation == IEEE-exact python model on observed grid
# --------------------------------------------------------------------------


@given(
    series=st.dictionaries(
        st.sampled_from(["w", "x", "y", "z"]),
        st.lists(st.integers(0, 4), min_size=2, max_size=5),
        min_size=2,
        max_size=3,
    )
)
@settings(**_SETTINGS)
def test_corr_matches_ieee_model(spark, series):
    rows, eid = [], 0
    for ty, counts in series.items():
        for h, c in enumerate(counts):
            for _ in range(c):
                rows.append(Row(event_id=eid, ts=_T0 + timedelta(hours=h),
                                event_type=ty, value=1.0))
                eid += 1
    if not rows:
        return
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, event_type string, value double",
    )
    got = {
        (r.type_a, r.type_b): (r.n_hours, r.corr)
        for r in ST.hourly_type_correlation(df).collect()
    }
    # the model sees only OBSERVED types (>=1 row) over OBSERVED hours
    # (>=1 row across all types) — the operator's dense grid is built
    # from the data, zeros filled in
    live = {t: c for t, c in series.items() if sum(c) > 0}
    hours = sorted(
        h for h in range(5)
        if any(h < len(c) and c[h] > 0 for c in live.values())
    )
    expect_pairs = {
        (a, b) for a in live for b in live if a < b
    }
    assert set(got) == expect_pairs
    for a, b in expect_pairs:
        xa = [live[a][h] if h < len(live[a]) else 0 for h in hours]
        xb = [live[b][h] if h < len(live[b]) else 0 for h in hours]
        n = len(hours)
        num = n * sum(p * q for p, q in zip(xa, xb)) - sum(xa) * sum(xb)
        da = n * sum(p * p for p in xa) - sum(xa) ** 2
        db = n * sum(q * q for q in xb) - sum(xb) ** 2
        n_hours, corr = got[(a, b)]
        assert n_hours == n
        if da == 0 or db == 0:
            assert corr is None
        else:
            # same IEEE ops in the same order: bit-identical, and the
            # Cauchy-Schwarz bound holds after rounding too
            assert corr == float(num) / math.sqrt(float(da) * float(db))
            assert abs(corr) <= 1.0 + 1e-12


# --------------------------------------------------------------------------
# psi_report == python model; non-negative; zero on identical shapes
# --------------------------------------------------------------------------


def _py_psi(rows, n_bins=10, width=10, base_days=7):
    """rows: (day_offset, type, value).  Returns {type: (n_base,
    n_curr, psi_micro)} replicating the operator's integer contract."""
    mints = min(d for d, _, _ in rows)
    out = {}
    for ty in {t for _, t, _ in rows}:
        base = Counter()
        curr = Counter()
        for d, t, v in rows:
            if t != ty:
                continue
            b = min(max(int(math.floor(v / width)), 0), n_bins - 1)
            if (d - mints) < timedelta(days=base_days):
                base[b] += 1
            else:
                curr[b] += 1
        n_b, n_c = sum(base.values()), sum(curr.values())
        total = 0
        for b in range(n_bins):
            p6 = max((base[b] + 1) * 1000000 // (n_b + n_bins), 1)
            q6 = max((curr[b] + 1) * 1000000 // (n_c + n_bins), 1)
            total += math.floor(((p6 - q6) / 1000000.0)
                                * math.log(p6 / q6) * 1000000.0)
        out[ty] = (n_b, n_c, total)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 13),                 # day offset
            st.sampled_from(["m", "n"]),        # type
            st.floats(0, 120, allow_nan=False), # value
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_psi_matches_model_and_nonnegative(spark, rows):
    data = [(
        _T0 + timedelta(days=d), ty, float(v)
    ) for d, ty, v in rows]
    df = spark.createDataFrame(
        [Row(event_id=i, ts=ts, event_type=ty, value=v)
         for i, (ts, ty, v) in enumerate(data)],
        "event_id long, ts timestamp_ntz, event_type string, value double",
    )
    got = {
        r.event_type: (r.n_base, r.n_curr, r.psi_micro)
        for r in ST.psi_report(df).collect()
    }
    expect = _py_psi([(ts, ty, v) for ts, ty, v in data])
    assert got == expect
    for _, _, psi in got.values():
        # every (p-q)·ln(p/q) term is >= 0, and floor keeps it there
        assert psi >= 0
