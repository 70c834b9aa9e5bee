"""Sinks: foreachBatch/foreachPartition writers for tables and Kafka."""
