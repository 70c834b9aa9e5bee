"""Subquery-shape and sketch-aggregate queries.

Value correctness for the oracle-backed queries is enforced by the driver's
DuckDB hash-compare (and `tools/check_oracles.py`); these tests pin the
*plan shapes* that make them scale — semi join, TakeOrderedAndProject, a
single window shuffle — and bound the sketch estimates against exact
answers (sketches have no SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_invoice_processor_spark.plans.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_plans_semi_join(spark, sf_dir):
    df = QUERIES["q4_order_priority"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    counts = {r["o_orderpriority"]: r["order_count"] for r in df.collect()}
    assert counts and all(c > 0 for c in counts.values())


def test_top_orders_uses_take_ordered(spark, sf_dir):
    df = QUERIES["top_orders_global"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert len(rows) == 10
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_orders_above_customer_avg_single_window(spark, sf_dir):
    df = QUERIES["orders_above_customer_avg"](spark, sf_dir)
    plan = _plan(df)
    # one window over o_custkey computes both sum and count: exactly one
    # exchange introduced by the window, no self-join
    assert plan.count("Window") == 1
    assert "Join" not in plan
    out = df.limit(5).collect()
    assert {"o_orderkey", "o_custkey", "o_totalprice"} == set(df.columns)
    assert out  # sf0.001 has above-average orders


def test_purchase_click_window_counts(spark, sf_dir):
    df = QUERIES["events_purchase_click_window"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    assert df.count() == n_purchases  # LEFT join keeps zero-click purchases
    assert df.where(F.col("clicks_before") < 0).count() == 0


def test_approx_stats_bounded_error(spark, sf_dir):
    """The query self-verifies: it computes sketch AND exact per type and
    emits within-5%-tolerance booleans (the oracle-checkable surface)."""
    rows = QUERIES["events_approx_stats"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact_n = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r["event_type"] for r in rows} == set(exact_n)
    for r in rows:
        assert r["n_rows"] == exact_n[r["event_type"]]
        assert r["hll_within_5pct"] is True
        assert r["median_within_5pct"] is True


def test_q6_pushes_all_filters_to_scan(spark, sf_dir):
    df = QUERIES["q6_revenue_filter"](spark, sf_dir)
    plan = _plan(df)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in scan or col in scan.split("PushedFilters")[1]
    # column pruning: only the 4 referenced columns are read
    read = scan.split("FileScan parquet [")[1].split("]")[0]
    assert set(c.split("#")[0] for c in read.split(",")) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }


def test_corpus_top_tokens_take_ordered_and_partial_agg(spark, sf_dir):
    df = QUERIES["corpus_top_tokens"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_events_user_rolling_single_user_shuffle(spark, sf_dir):
    df = QUERIES["events_user_rolling"](spark, sf_dir)
    rows = df.where(F.col("user_id") == 1).collect()
    assert rows
    # brute-force check the frame semantics for one user
    base = sorted(
        (r["ts_sec"], r["event_id"], r["n_prev_hour"], r["sum_prev_hour_1e4"])
        for r in rows
    )
    ts_list = [t for t, *_ in base]
    for t, _eid, n, _s in base:
        assert n == sum(1 for u in ts_list if t - 3599 <= u <= t)
    plan = _plan(df)
    assert "windowspecdefinition(user_id" in plan


def test_embedding_quantize_is_shuffle_free(spark, sf_dir):
    df = QUERIES["embedding_quantize"](spark, sf_dir)
    assert "Exchange" not in _plan(df)  # pure map at scan speed


def test_scd2_single_user_shuffle_and_interval_laws(spark, sf_dir):
    """Both SCD2 windows + the change filter share one user_id exchange,
    and the output obeys the type-2 laws: exactly one open interval per
    user, intervals tile (valid_to == next valid_from), versions dense
    from 1, and no two consecutive versions share a state."""
    df = QUERIES["events_scd2_history"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    rows = df.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r["is_current"] for r in hist) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]  # gap-free tiling
            assert a["state"] != b["state"]  # no no-op versions
