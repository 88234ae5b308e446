"""Structured Streaming surface: watermarked windows, stateful dedup, and
the checkpointed streaming twin of the CDC ingest path."""
