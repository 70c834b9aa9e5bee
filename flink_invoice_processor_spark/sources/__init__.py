"""Sources: Kafka readStream wrapper + polling/claiming JDBC sources."""
