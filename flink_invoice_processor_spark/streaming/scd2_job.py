"""Incrementally-maintained SCD2 state history (streaming).

The batch operator (``functions/scd2.py``, oracle-gated as
``events_scd2_history``) rebuilds every user's version chain.  This job
maintains the same history table INCREMENTALLY under a stream of
events, using the matview partition-overwrite machinery
(``streaming/matview.py``) with the user-bucket as the unit of
maintenance:

1. each micro-batch lands in a base table partitioned by
   ``(ub = pmod(user_id, n_buckets), epoch)`` via dynamic partition
   OVERWRITE — a replayed epoch rewrites its own partitions with
   identical content instead of appending a second copy (the same
   replay fence the matview base uses; plain append would double every
   observation after a crash between sink commit and checkpoint
   commit);
2. the SCD2 history is recomputed for ONLY the buckets the batch
   touched — reading the base with a partition-pruning ``ub`` filter,
   running the SHARED ``scd2_history`` (so batch and stream can never
   drift), and dynamic-overwriting exactly those ``ub`` partitions of
   the view.  Untouched buckets are never rewritten (pinned by a
   file-mtime test).

Why bucket recompute instead of per-user open-interval upsert: closing
an open interval in place needs row-level UPDATE, which parquet cannot
do, and an append-only "close record" scheme breaks under OUT-OF-ORDER
arrivals (a late event can split an interval that already closed).
Recomputing a touched bucket from the base is correct under ANY arrival
order — correctness is order-free, and the work per batch is
O(touched buckets × bucket size), not O(corpus).  At 100 TB, size
``n_buckets`` so a bucket is a few hundred MB: the hot set per
micro-batch is the handful of buckets with active users, and the base
read under the ``ub`` filter is partition-pruned to exactly those.

At-least-once duplicate defense: the same observation redelivered in a
DIFFERENT epoch survives the epoch fence (two base copies), so the
recompute deduplicates exact (user_id, ts, event_type) triples before
building versions — a redelivered observation can never split or
duplicate a version (pinned in tests/test_scd2_job.py).

One lineage per table path (same contract as the other fenced sinks,
``streaming/cdc_job.py`` / ``cms_rollup_writer``): restarting from a
FRESH checkpoint reuses epoch ids against the old base — point a new
stream at a new base path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.scd2 import scd2_history


def upsert_scd2(
    spark: SparkSession,
    batch_df: DataFrame,
    base_path: str,
    view_path: str,
    epoch_id: int = 0,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of incremental SCD2 maintenance (see module
    docstring).  ``batch_df`` columns: user_id LONG, ts TIMESTAMP,
    event_type STRING."""
    if batch_df.isEmpty():
        return
    with_bucket = batch_df.select(
        "user_id", "ts", "event_type",
        F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int").alias("ub"),
    ).persist()  # consumed twice: base write + touched-bucket scan
    try:
        # repartition("ub") before the landing write (the matview /
        # chunk-store landing-fan pattern): without it every input
        # partition fans into every touched bucket dir (tasks × buckets
        # files per epoch); with it each bucket's rows land from one
        # partition = 1 file per (ub, epoch) dir.  epoch is a per-batch
        # constant so hashing on ub alone co-locates each output dir.
        (
            with_bucket.repartition("ub")
            .withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ub", "epoch")
            .parquet(base_path)
        )
        touched = [
            r["ub"] for r in with_bucket.select("ub").distinct().collect()
        ]
    finally:
        with_bucket.unpersist()
    base = (
        spark.read.parquet(base_path)
        .where(F.col("ub").isin(touched))
        # cross-epoch redelivery defense: exact duplicate observations
        # collapse before versioning (epoch replay is already fenced by
        # the dynamic overwrite above; this handles source-level
        # at-least-once duplicates landing in different epochs)
        .dropDuplicates(["user_id", "ts", "event_type"])
    )
    history = scd2_history(base).withColumn(
        "ub", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
    )
    # scd2_history leaves the rows hash-partitioned by user_id (its
    # versioning window), which does NOT align with ub — without the
    # repartition the view write fans tasks × touched-buckets files
    (
        history.repartition("ub").write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ub")
        .parquet(view_path)
    )


def run_scd2_job(
    events: DataFrame,
    base_path: str,
    view_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
    n_buckets: int = 64,
) -> StreamingQuery:
    """Start the incremental SCD2 maintainer over a streaming events
    DataFrame (columns: user_id LONG, ts TIMESTAMP, event_type STRING)."""
    spark = events.sparkSession

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_scd2(
            spark, batch_df, base_path, view_path, epoch_id, n_buckets
        )

    return (
        events.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
