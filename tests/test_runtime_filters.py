"""Runtime bloom-filter join pruning: at cluster scale Spark injects a
bloom filter built from the selective side of a shuffle join into the
probe side's scan (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
on by default in the session factory).  The size thresholds that gate
injection are tuned for clusters (application side > 10 GB), so test
data never qualifies; these tests lower the thresholds to pin that OUR
join shapes are injectable — i.e. the 100 TB deployment gets row-level
pruning for free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prior.items():
        spark.conf.set(k, v)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_selective_join_injects_bloom_filter(spark, sf_dir, bloom_confs):
    big = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 100000")
        .select("o_orderkey")
    )
    j = big.join(small, big.l_orderkey == small.o_orderkey)
    plan = _optimized(j)
    assert "might_contain" in plan, plan[:2000]
    # the filter lands on the PROBE side scan, keyed on the join column
    assert "l_orderkey" in plan.split("might_contain", 1)[1][:200]


def test_bloom_not_injected_for_broadcast_join(spark, sf_dir):
    # broadcast joins already prune at the hash table; no bloom expected
    big = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 100000")
        .select("o_orderkey")
    )
    j = big.join(F.broadcast(small), big.l_orderkey == small.o_orderkey)
    assert "might_contain" not in _optimized(j)
