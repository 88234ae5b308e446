"""Source/sink builders: Kafka (batch + streaming) and parquet sinks."""
