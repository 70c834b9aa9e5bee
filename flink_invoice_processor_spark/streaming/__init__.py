"""Streaming wiring: Kafka IO, the two reference jobs, the retry driver loop."""
