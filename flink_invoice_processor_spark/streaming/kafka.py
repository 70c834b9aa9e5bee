"""Kafka source/sink wrappers (reference S1 / W2 / K5).

The reference builds five separate topic-pinned sources and five sinks
(``util/FlinkJobUtils.java:28-87``, wired in ``job/InvoiceRequest.java:53-69``
and ``job/InvoiceResponse.java:124-143``).  Spark collapses both sides:

- one reader with ``subscribe = t1,t2,...`` — the ``topic`` metadata column
  replaces per-topic streams (the reference's 6-way union U1 disappears);
- one writer honoring a per-row ``topic`` column — the api_type switch
  (``InvoiceResponseKafkaRouter.java:52-70``) becomes a column expression
  and five sinks become one.

Delivery is at-least-once on both ends, matching the reference
(``DeliveryGuarantee.AT_LEAST_ONCE``, ``FlinkJobUtils.java:85``); Spark
checkpointing of offsets is a strict upgrade over the reference's
no-checkpoint posture.

SASL/PLAIN options mirror the reference's security config keys without any
of its values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig


def _sasl_options(cfg: EngineConfig) -> dict[str, str]:
    if not cfg.kafka_sasl_user:
        return {}
    jaas = (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        f'username="{cfg.kafka_sasl_user}" password="{cfg.kafka_sasl_password}";'
    )
    return {
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": jaas,
    }


def kafka_request_stream(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    """readStream over all five request topics; output columns
    ``value`` (string packet JSON) and ``topic``."""
    starting = {
        "LATEST": "latest",
        "EARLIEST": "earliest",
        # the reference's COMMITTED mode maps to Spark resuming from its own
        # checkpointed offsets; "latest" is the cold-start behavior
        "COMMITTED": "latest",
    }.get(cfg.kafka_starting_offsets.upper(), "latest")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
        .option("subscribe", ",".join(cfg.request_topics.values()))
        .option("startingOffsets", starting)
        .option("failOnDataLoss", "false")
    )
    for k, v in _sasl_options(cfg).items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("value").cast("string").alias("value"), F.col("topic")
    )


def write_packets_to_kafka(
    packets: DataFrame, cfg: EngineConfig, checkpoint_dir: str
):
    """writeStream for assembled response packets: one sink, routed by the
    per-row ``topic`` column (replaces the reference's five sinks)."""
    writer = (
        packets.selectExpr("topic", "packet_json AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in _sasl_options(cfg).items():
        writer = writer.option(k, v)
    return writer.start()


def write_packets_batch_to_kafka(
    packets: DataFrame, cfg: EngineConfig
) -> None:
    """Batch-mode Kafka write for use inside foreachBatch."""
    writer = (
        packets.selectExpr("topic", "packet_json AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
    )
    for k, v in _sasl_options(cfg).items():
        writer = writer.option(k, v)
    writer.save()
