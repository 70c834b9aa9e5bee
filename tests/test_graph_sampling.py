"""Edge cases for triangle counting and PPS systematic sampling (happy
paths are oracle-gated)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import curation as CUR
from flink_invoice_processor_spark.functions import graph as GR


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(doc_id_a=a, doc_id_b=b) for a, b in pairs]
    )


def test_triangle_counts_shared_edge(spark):
    # triangles {1,2,3} and {2,3,4} share edge (2,3)
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    out = {r.doc_id: r.n_triangles for r in GR.triangle_counts(e).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_counts_chain_has_none(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert GR.triangle_counts(e).count() == 0


def test_pps_sample_includes_heavy_excludes_zero(spark):
    rows = [Row(doc_id=i, w=1) for i in range(50)]
    rows.append(Row(doc_id=99, w=50))
    rows.append(Row(doc_id=100, w=0))
    df = spark.createDataFrame(rows)
    out = CUR.pps_systematic_sample(
        df, F.col("w"), n_samples=10, order_col="doc_id"
    ).collect()
    picked = {r.doc_id for r in out}
    assert 99 in picked  # heavy unit (half the mass) is a certainty unit
    assert 100 not in picked  # zero weight can never cross a boundary
    # total 100, stride 10 -> ~10 crossings, heavy unit crosses 5 but
    # is emitted once
    assert 5 <= len(picked) <= 11
    # cumulative weights are a prefix sum in doc_id order
    for r in out:
        assert r.cum_w >= r.w


def test_pps_prefix_sum_matches_plain_window(spark):
    rows = [Row(doc_id=i, w=(i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows)
    got = CUR.distributed_prefix_sum(
        df, [F.col("doc_id")], F.col("w"), out_col="cum_w"
    )
    from pyspark.sql import Window

    exp = df.withColumn(
        "cum_w",
        F.sum("w").over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    assert sorted((r.doc_id, r.cum_w) for r in got.collect()) == sorted(
        (r.doc_id, r.cum_w) for r in exp.collect()
    )


def test_dq_checks_detect_violations(spark):
    from flink_invoice_processor_spark.functions import quality as DQ

    df = spark.createDataFrame(
        [(1, 5.0, "A"), (2, 99.0, "A"), (2, 5.0, "X"), (None, 5.0, "N")],
        "k long, q double, f string",
    )
    out = {
        r.check_name: (r.violations, r.status)
        for r in DQ.run_checks(
            df,
            [
                DQ.not_null("k"),
                DQ.in_range("q", 1, 50),
                DQ.accepted_values("f", ["A", "N", "R"]),
                DQ.unique("k"),
            ],
        ).collect()
    }
    assert out["not_null(k)"] == (1, "fail")
    assert out["range(q)"] == (1, "fail")
    assert out["accepted_values(f)"] == (1, "fail")
    # k has 4 rows, 3 distinct (2, 2, 1, NULL -> distinct counts non-null:
    # {1,2} = 2) -> violations = 4 - 2 = 2
    assert out["unique(k)"] == (2, "fail")


def test_dq_referential_integrity(spark):
    from flink_invoice_processor_spark.functions import quality as DQ

    child = spark.createDataFrame([(1,), (2,), (5,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = DQ.referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert (r.violations, r.status) == (1, "fail")
    ok = DQ.referential_integrity(parent, "pk", parent, "pk").collect()[0]
    assert (ok.violations, ok.status) == (0, "pass")


def test_dq_matches_regex_check(spark):
    from flink_invoice_processor_spark.functions import quality as DQ

    df = spark.createDataFrame(
        [("S-1",), ("S-2",), ("bad",), (None,)], "sid string"
    )
    r = DQ.run_checks(df, [DQ.matches("sid", "^S-[0-9]+$")]).collect()[0]
    assert (r.violations, r.status) == (2, "fail")


def test_dq_quoting_and_empty_suite_guard(spark):
    import pytest as _pytest

    from flink_invoice_processor_spark.functions import quality as DQ

    df = spark.createDataFrame([("O'Brien",), ("x",)], "name string")
    r = DQ.run_checks(
        df, [DQ.accepted_values("name", ["O'Brien"])]
    ).collect()[0]
    assert (r.violations, r.status) == (1, "fail")  # 'x' violates
    r2 = DQ.run_checks(df, [DQ.matches("name", "^[A-Za-z']+$")]).collect()[0]
    assert r2.status == "pass"
    with _pytest.raises(ValueError, match="empty check suite"):
        DQ.run_checks(df, [])
