"""Directory-partitioned writes prune at the planner level.

A date-partitioned events layout must turn a date predicate into
``PartitionFilters`` (directory pruning — no file footers opened for
excluded dates) while keeping results identical to the unpartitioned scan.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flink_invoice_processor_spark.tables import load_table, write_partitioned


def test_partitioned_write_prunes_by_date(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_date")
    write_partitioned(
        ev.withColumn("event_date", F.to_date("ts")), out, ["event_date"]
    )

    part = spark.read.parquet(out)
    target = ev.select(F.to_date("ts").alias("d")).first()["d"]
    q = part.where(F.col("event_date") == F.lit(target))
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()

    # the date predicate is resolved against directory names...
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "event_date" in m.group(1)
    # ...and never reaches the parquet readers as a data filter
    pushed = re.search(r"PushedFilters: \[([^\]]*)", plan)
    assert pushed and "event_date" not in pushed.group(1)

    expected = ev.where(F.to_date("ts") == F.lit(target)).count()
    assert q.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_rt")
    write_partitioned(ev.withColumn("event_date", F.to_date("ts")), out, ["event_date"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]
