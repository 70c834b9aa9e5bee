"""SparkSession factory.

Local-mode defaults are tuned for the test harness (``local[N]``, AQE on,
UTC timezone so results hash-compare cleanly against DuckDB oracles).
On a real cluster the same builder is used with ``master`` left to
spark-submit and ``shuffle_partitions`` sized to the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_invoice_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE enabled: runtime shuffle-partition coalescing + skew-join
      handling, which is what makes a fixed ``shuffle_partitions``
      setting safe from sf0.001 up to cluster scale.
    - Arrow enabled: every pandas UDF / applyInPandas in this package
      rides Arrow batches.
    - UTC session timezone: timestamps must compare equal between Spark
      and DuckDB (which is UTC-naive).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # the synthetic events table carries timestamp[ns]; read as long and
        # convert in tables.load_table (Spark rejects NANOS otherwise)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
