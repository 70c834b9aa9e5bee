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


def test_sorted_write_makes_row_group_stats_disjoint(spark, tmp_path):
    """write_sorted exists to make row-group min/max pruning effective:
    after sortWithinPartitions(user_id), each row group covers a narrow
    user_id range instead of the whole domain.  Read the parquet footers
    and compare the average per-row-group span against an unsorted write."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from flink_invoice_processor_spark.tables import write_sorted

    df = (
        spark.range(200_000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 1000).alias("user_id"),  # cycles the full domain
            (F.col("id") * 7 % 97).alias("value"),
        )
        .coalesce(2)
    )
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    write_sorted(df, sorted_path, ["user_id"], row_group_size=64 * 1024)
    (df.write.mode("overwrite")
       .option("parquet.block.size", 64 * 1024).parquet(unsorted_path))

    def spans(path):
        import glob
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx["user_id"]).statistics
                out.append(st.max - st.min)
        return out

    s_spans, u_spans = spans(sorted_path), spans(unsorted_path)
    assert len(s_spans) >= 4, (s_spans, "need several row groups")
    avg_s = sum(s_spans) / len(s_spans)
    avg_u = sum(u_spans) / len(u_spans)
    # unsorted row groups span ~the whole user domain; sorted ones a slice
    assert avg_s < 0.35 * avg_u, (avg_s, avg_u)
