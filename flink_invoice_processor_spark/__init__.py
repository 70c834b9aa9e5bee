"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference invoice stream processor
(``thaihoc1310/flink-invoice-processor``), re-expressed Spark-first.

The reference is a Flink 1.20 DataStream application: two streaming jobs
(invoice request ingest, invoice response assembly/routing) plus a
MySQL-backed retry delay-queue.  This package rebuilds the same
capability surface on the Spark DataFrame / SQL / Structured Streaming
stack:

- ``schemas``     — single source of truth for every record shape.
- ``config``      — properties-file + CLI parameter loading (reference
                    ``util/FlinkJobUtils.java:17-26`` precedence).
- ``operators``   — pure, batch-testable DataFrame transforms for the
                    request / response / retry dataflows.
- ``sources``     — Kafka readStream wrapper + polling/claiming JDBC
                    source (reference ``source/*.java``).
- ``sinks``       — foreachBatch JDBC batch insert, retry-queue DML,
                    transactional log-and-delete, Kafka topic routing.
- ``streaming``   — job wiring that composes the above into the two
                    reference jobs.
- ``functions``   — scale-path extras: dedup (exact/MinHash-LSH/SimHash/
                    n-gram Jaccard), embedding similarity search, text
                    analysis, multimodal column plumbing.

Everything here is plain public PySpark; no custom JVM code.
"""

__version__ = "0.1.0"
