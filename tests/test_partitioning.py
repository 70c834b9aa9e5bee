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


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Sorting on the Morton code gives BOTH x and y narrow row-group
    spans; sorting on x alone leaves y at full domain."""
    import glob
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from flink_invoice_processor_spark.tables import write_sorted, zorder_value

    df = (
        spark.range(200_000)
        .select(
            (F.col("id") % 1024).alias("x"),
            ((F.col("id") * 7919) % 1024).alias("y"),
        )
        .coalesce(2)
    )
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    write_sorted(
        df.withColumn("z", zorder_value(F.col("x"), F.col("y"), bits=10)),
        zpath, ["z"], row_group_size=64 * 1024,
    )
    write_sorted(df, xpath, ["x"], row_group_size=64 * 1024)

    def avg_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                spans.append(st.max - st.min)
        assert len(spans) >= 4
        return sum(spans) / len(spans)

    full = 1023
    # x-sorted: x narrow, y full-domain
    assert avg_span(xpath, "x") < 0.35 * full
    assert avg_span(xpath, "y") > 0.9 * full
    # z-sorted: BOTH dimensions substantially narrowed
    assert avg_span(zpath, "x") < 0.6 * full
    assert avg_span(zpath, "y") < 0.6 * full


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Parquet datasets evolve: later batches add columns.  mergeSchema
    reads the union; old rows surface NULLs for new columns — the append
    contract a long-lived 100 TB dataset depends on."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
