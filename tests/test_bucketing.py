"""Bucketed tables: a same-bucketing join runs with NO shuffle Exchange on
either side, and results equal the plain join — the write-once-shuffle-never
pattern for repeatedly-joined big tables.

Auto-broadcast is disabled inside these tests: at test scale Spark would
broadcast the small side (also exchange-free, but it would bypass the
bucketed path being verified — at 100 TB neither side is broadcastable)."""

from __future__ import annotations

import pytest

from flink_invoice_processor_spark.tables import load_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark.table("b_orders"), spark.table("b_lineitem"), orders, lineitem
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    b_orders, b_lineitem, _, _ = bucketed
    joined = b_orders.join(
        b_lineitem, b_orders.o_orderkey == b_lineitem.l_orderkey
    )
    plan = _plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed):
    b_orders, b_lineitem, orders, lineitem = bucketed
    bucketed_n = (
        b_orders.join(b_lineitem, b_orders.o_orderkey == b_lineitem.l_orderkey)
        .count()
    )
    plain_n = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    assert bucketed_n == plain_n


def test_bucketed_groupby_has_no_shuffle(spark, bucketed):
    b_orders, _, _, _ = bucketed
    agg = b_orders.groupBy("o_orderkey").count()
    assert "Exchange" not in _plan(agg)
