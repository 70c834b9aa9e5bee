"""Incrementally-maintained aggregate materialized view.

Pattern: a streaming source feeds ``foreachBatch``; each micro-batch
recomputes ONLY the (hour, event_type) partitions it touches and rewrites
exactly those partitions of a parquet "view" table via dynamic partition
overwrite.

ATOMICITY CAVEAT: plain-parquet partition overwrite deletes then
rewrites files, so a reader listing a touched hour MID-overwrite can see
it empty or mixed.  Readers that resolve once per query (normal Spark
scans) see whole files, but there is no cross-file snapshot; production
deployments wanting atomic swaps should back the view with a table
format that commits atomically (Delta/Iceberg) or a version-marker swap
like ``streaming/sketch_rollup.py`` uses.  Untouched partitions are
never rewritten, so history stays stable either way.

Replay safety: a plain append of the raw batch would NOT be idempotent —
if the job dies after the append commits but before the streaming
checkpoint commits the epoch, the replayed batch would double-count the
base forever.  So the base table is partitioned by (hour, epoch) and
written with dynamic partition OVERWRITE: replaying epoch E rewrites the
same (hour, epoch=E) partitions with identical content instead of
appending a second copy.

Why this instead of streaming ``update`` mode into a sink: parquet (and
object stores generally) can't update rows in place, but they CAN swap
whole partitions atomically per partition — so the partition is the unit
of incremental maintenance.  At 100 TB the hot set per micro-batch is a
handful of recent-hour partitions; untouched history is never rewritten.

The per-batch recompute joins the BATCH's touched keys against the BASE
table accumulated so far — state lives in the base table, not in memory,
so the job restarts stateless (cf. the reference's in-memory HWM fixed in
``sources/stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def upsert_hourly_counts(
    spark: SparkSession,
    batch_df: DataFrame,
    base_path: str,
    view_path: str,
    epoch_id: int = 0,
) -> None:
    """One micro-batch of incremental maintenance:

    1. write the raw batch into the base table's (hour, epoch=epoch_id)
       partitions via dynamic OVERWRITE — a replayed epoch rewrites its
       own partitions with identical content (idempotent), never appends
       a second copy;
    2. recompute aggregates for ONLY the hours present in this batch,
       reading the base table with a partition-pruning filter;
    3. dynamic-partition-overwrite those hours in the view.
    """
    if batch_df.isEmpty():
        return
    with_hour = batch_df.withColumn(
        "hour", F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd-HH")
    ).persist()  # consumed twice: base write + touched-hours scan
    try:
        # repartition("hour") before the landing write: without it every
        # input partition fans into every touched hour-dir (32 partitions
        # x 24 hours = 768 files per epoch, measured 7.7 s at the decade);
        # with it each hour's rows land from one partition = 1 file per
        # hour-dir (24 files, 1.8 s).  epoch is a per-batch constant so
        # hashing on hour alone already co-locates each output dir, and
        # AQE may coalesce the small post-shuffle partitions — whole
        # partitions merge, so the one-file-per-hour property survives.
        (
            with_hour.repartition("hour")
            .withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour", "epoch")
            .parquet(base_path)
        )
        touched = [r["hour"] for r in with_hour.select("hour").distinct().collect()]
    finally:
        with_hour.unpersist()
    base = spark.read.parquet(base_path).where(F.col("hour").isin(touched))
    agg = base.groupBy("hour", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("sum_value_1e4"),
    )
    # the aggregate is model-sized (touched-hours x event-types rows);
    # repartition("hour") costs a tiny shuffle and pins one file per
    # touched hour-dir (the groupBy leaves rows hashed by (hour, type),
    # which would otherwise fan up to |types| files into each dir)
    (
        agg.repartition("hour")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour")
        .parquet(view_path)
    )


def run_hourly_matview_job(
    events: DataFrame,
    base_path: str,
    view_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
) -> StreamingQuery:
    """Start the incremental-view job over a streaming events DataFrame
    (columns: ts TIMESTAMP, event_type STRING, value DOUBLE)."""
    spark = events.sparkSession

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_hourly_counts(spark, batch_df, base_path, view_path, epoch_id)

    return (
        events.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
