"""CDC MERGE apply (functions/cdc.py) and the bucketized interval-overlap
join added late in round 6.  Value correctness is driver-gated (both are
oracle-registered); these tests pin the operator semantics on adversarial
inputs the derived testdata never produces, and the blocking-completeness
property the oracle equality rests on."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_invoice_processor_spark.functions import cdc as CDC
from flink_invoice_processor_spark.plans.queries import QUERIES


def _base(spark):
    return spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in range(6)]
    )


def test_apply_changes_semantics(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            Row(op="D", k=0, v=None),
            Row(op="U", k=1, v="v1-new"),
            Row(op="I", k=100, v="v100"),
        ]
    )
    out = {r["k"]: (r["v"], r["src"]) for r in
           CDC.apply_changes(base, changes, ["k"]).collect()}
    assert 0 not in out  # deleted
    assert out[1] == ("v1-new", "updated")
    assert out[100] == ("v100", "inserted")
    for k in (2, 3, 4, 5):
        assert out[k] == (f"v{k}", "kept")
    assert len(out) == 6  # 6 base - 1 del - 0 + 1 ins ... 5 kept/updated +1


def test_apply_changes_rejects_unknown_op(spark):
    base = _base(spark)
    changes = spark.createDataFrame([Row(op="X", k=1, v="boom")])
    with pytest.raises(Exception) as ei:
        CDC.apply_changes(base, changes, ["k"]).collect()
    assert "op must be one of D/U/I" in str(ei.value)


def test_apply_changes_rejects_unknown_op_in_deletes_only_batch(spark):
    """The guard must fire even when the replaced (U/I) branch is empty
    — it rides BOTH branches, so a deletes-plus-typo batch cannot
    silently drop the typo row (review finding: a one-branch guard only
    evaluated because Catalyst happened to push the predicate)."""
    base = _base(spark)
    changes = spark.createDataFrame(
        [("D", 0, None), ("d", 1, None)], "op string, k long, v string"
    )
    with pytest.raises(Exception) as ei:
        CDC.apply_changes(base, changes, ["k"]).collect()
    assert "op must be one of D/U/I" in str(ei.value)


def test_apply_changes_empty_batch_is_identity(spark):
    base = _base(spark)
    changes = spark.createDataFrame([], "op string, k long, v string")
    out = CDC.apply_changes(base, changes, ["k"])
    assert out.where(F.col("src") != "kept").count() == 0
    assert out.count() == base.count()


def test_interval_join_blocking_is_complete(spark, sf_dir):
    """The bucketized candidate join must find EXACTLY the pairs the
    unblocked cartesian range predicate finds (blocking may overgenerate
    candidates but the exact filter prunes them; it must never lose a
    pair)."""
    got = QUERIES["events_incident_overlap_join"](spark, sf_dir)
    got_pairs = {
        (r["user_id"], r["session_start"], r["incident_id"]): r["overlap_us"]
        for r in got.collect()
    }

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    brk = F.when(
        F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 5 MINUTES"), 0
    ).otherwise(1)
    s = ev.select("user_id", "ts", brk.alias("brk")).select(
        "user_id", "ts",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("sess"),
    )
    sessions = s.groupBy("user_id", "sess").agg(
        F.min("ts").alias("s_start"),
        (F.max("ts") + F.expr("INTERVAL 5 MINUTES")).alias("s_end"),
    )
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("i_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("i_end"),
    )
    brute = (
        sessions.crossJoin(incidents)
        .where(
            (F.col("s_start") < F.col("i_end"))
            & (F.col("i_start") < F.col("s_end"))
        )
        .select(
            "user_id", F.col("s_start").alias("session_start"), "incident_id",
            F.expr(
                "CAST(timestampdiff(MICROSECOND, "
                "greatest(s_start, i_start), least(s_end, i_end)) AS BIGINT)"
            ).alias("overlap_us"),
        )
    )
    brute_pairs = {
        (r["user_id"], r["session_start"], r["incident_id"]): r["overlap_us"]
        for r in brute.collect()
    }
    assert got_pairs == brute_pairs
    assert got_pairs  # non-empty at sf0.001
    assert all(v > 0 for v in got_pairs.values())
