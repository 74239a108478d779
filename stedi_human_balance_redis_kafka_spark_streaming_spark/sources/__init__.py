"""Sources & sinks: Kafka (streaming), Parquet/files (batch), console, memory, Redis."""
