"""Exact order statistics (functions/stats.py) against pure-Python
models: the histogram-rank median/MAD and winsorized sums must agree
with the textbook definitions on arbitrary small integer datasets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_invoice_processor_spark.functions import stats as ST

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_datasets = st.dictionaries(
    st.sampled_from(["a", "b"]),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
             max_size=25),
    min_size=1,
    max_size=2,
)


def _median_x2(vals: list[int]) -> int:
    s = sorted(vals)
    n = len(s)
    return s[(n - 1) // 2] + s[n // 2]


def _rows(data: dict[str, list[int]]):
    return [(k, v) for k, vals in data.items() for v in vals]


@settings(**_SETTINGS)
@given(_datasets)
def test_grouped_median_mad_matches_python(spark, data):
    df = spark.createDataFrame(_rows(data), "k string, v long")
    out = {
        r["k"]: r for r in ST.grouped_median_mad(df, "k", "v").collect()
    }
    assert set(out) == set(data)
    for k, vals in data.items():
        med2 = _median_x2(vals)
        # dev = 2*|v - med| as integers: |2v - med2|
        devs = [abs(2 * v - med2) for v in vals]
        assert out[k]["n"] == len(vals)
        assert out[k]["median_x2"] == med2
        assert out[k]["mad_x4"] == _median_x2(devs)


@settings(**_SETTINGS)
@given(_datasets, st.integers(min_value=0, max_value=5))
def test_robust_outlier_counts_matches_python(spark, data, c):
    df = spark.createDataFrame(_rows(data), "k string, v long")
    out = {
        r["k"]: r
        for r in ST.robust_outlier_counts(df, "k", "v", c=c).collect()
    }
    for k, vals in data.items():
        med2 = _median_x2(vals)
        mad4 = _median_x2([abs(2 * v - med2) for v in vals])
        expected = sum(
            1 for v in vals if 2 * abs(2 * v - med2) > c * mad4
        )
        assert out[k]["n_outliers"] == expected, (k, vals, c)


@settings(**_SETTINGS)
@given(_datasets)
def test_winsorized_stats_matches_python(spark, data):
    df = spark.createDataFrame(_rows(data), "k string, v long")
    out = {
        r["k"]: r
        for r in ST.winsorized_stats(df, "k", "v", 5, 95).collect()
    }
    for k, vals in data.items():
        s = sorted(vals)
        n = len(s)
        k_lo = max(1, -(-5 * n // 100))   # ceil(5n/100), 1-based
        k_hi = -(-95 * n // 100)
        lo, hi = s[k_lo - 1], s[k_hi - 1]
        assert out[k]["lo_bound"] == lo
        assert out[k]["hi_bound"] == hi
        assert out[k]["winsorized_sum"] == sum(
            min(hi, max(lo, v)) for v in vals
        )
        assert out[k]["raw_sum"] == sum(vals)


@settings(**_SETTINGS)
@given(_datasets)
def test_grouped_quantiles_matches_python(spark, data):
    df = spark.createDataFrame(_rows(data), "k string, v long")
    out = {
        r["k"]: r
        for r in ST.grouped_quantiles(df, "k", "v", (50, 90, 99)).collect()
    }
    for k, vals in data.items():
        s = sorted(vals)
        n = len(s)
        for p in (50, 90, 99):
            rank = max(1, -(-p * n // 100))  # ceil(p*n/100), 1-based
            assert out[k][f"p{p}"] == s[rank - 1], (k, vals, p)


def test_median_even_count_is_mean_of_middle_pair(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 7), ("a", 100)], "k string, v long"
    )
    row = ST.grouped_median_mad(df, "k", "v").collect()[0]
    # median of [1,3,7,100] = (3+7)/2 → carried doubled as 10
    assert row["median_x2"] == 10
    # devs (2|v-med|): [8, 4, 4, 190] → median (4+8)/2 → mad_x4 = 12
    assert row["mad_x4"] == 12


def test_winsorized_overflow_guard_fires_loudly(spark):
    import pytest

    big = 2**62
    df = spark.createDataFrame(
        [("a", big), ("a", big), ("a", big)], "k string, v long"
    )
    with pytest.raises(Exception, match="winsorized_stats"):
        ST.winsorized_stats(df, "k", "v", 5, 95).collect()
    # in-bound data on the same plan shape still flows
    ok = ST.winsorized_stats(
        spark.createDataFrame([("a", 5), ("a", 7)], "k string, v long"),
        "k",
        "v",
        5,
        95,
    ).collect()
    assert ok[0]["raw_sum"] == 12


def test_reserved_key_name_is_rejected(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "cnt string, v long")
    with pytest.raises(ValueError, match="collides"):
        ST.grouped_median_mad(df, "cnt", "v")
    with pytest.raises(ValueError, match="collides"):
        ST.value_histogram(df, "cnt", "v")


def test_outlier_ties_are_not_flagged(spark):
    # |v - med| == c * MAD exactly must NOT count (strict inequality)
    df = spark.createDataFrame(
        [("a", v) for v in [0, 0, 0, 4, -4, 12]], "k string, v long"
    )
    stats = ST.grouped_median_mad(df, "k", "v").collect()[0]
    med2, mad4 = stats["median_x2"], stats["mad_x4"]
    out = ST.robust_outlier_counts(df, "k", "v", c=3).collect()[0]
    expected = sum(
        1
        for v in [0, 0, 0, 4, -4, 12]
        if 2 * abs(2 * v - med2) > 3 * mad4
    )
    assert out["n_outliers"] == expected
