"""Kafka source builders — the engine's S1/S2 surface.

The reference reads Kafka in batch with hand-built options
(kafka_to_s3_enhanced.py:85-101,146; kafka_to_s3_batch.py:64-72):
`startingOffsets` is either a JSON literal pinning partition 0 to
saved-offset+1 or "earliest". These builders reproduce that exact option
surface for batch, and expose the streaming form where the checkpoint
makes hand-built offsets obsolete.

No Kafka broker (or spark-sql-kafka connector jar) exists in this test
environment, so `load()` is the caller's step — the builders return a
configured DataFrameReader/DataStreamReader. The option-construction logic
(the part the reference got subtly wrong: single-partition assumption,
+1 arithmetic) is pure and unit-tested; the JSONL fixture path
(cdc/parse.read_event_file) stands in as the wire-parity source for
integration tests.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def starting_offsets_json(
    topic: str, last_offsets: dict[int, int] | None
) -> str:
    """The `startingOffsets` option value for an incremental batch read.

    `last_offsets` maps partition → last PROCESSED offset (the +1 resume
    arithmetic lives here, for every partition — the reference hardcoded
    partition 0, enhanced.py:94-96). None → "earliest" (first run /
    snapshot, mirroring enhanced.py:99-101)."""
    if not last_offsets:
        return "earliest"
    return json.dumps({topic: {str(p): o + 1 for p, o in last_offsets.items()}})


def kafka_batch_options(
    bootstrap_servers: str,
    topic: str,
    last_offsets: dict[int, int] | None = None,
) -> dict[str, str]:
    """Full batch option set (reference parity: enhanced.py:85-91)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets_json(topic, last_offsets),
        "endingOffsets": "latest",
        "failOnDataLoss": "false",
    }


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    last_offsets: dict[int, int] | None = None,
):
    """Configured batch reader: `reader.load()` yields the Kafka envelope
    (key/value binary, topic, partition, offset, timestamp)."""
    reader = spark.read.format("kafka")
    for k, v in kafka_batch_options(bootstrap_servers, topic, last_offsets).items():
        reader = reader.option(k, v)
    return reader


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
):
    """Streaming reader for one-or-many topics (comma list or pattern via
    subscribePattern — subsumes the reference's 4-task Airflow fan-out, U7).
    Offset progress is the checkpoint's job; startingOffsets only seeds the
    FIRST run (≡ Debezium snapshot.mode=initial, U1)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
    )
