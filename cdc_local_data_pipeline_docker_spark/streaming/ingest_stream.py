"""Streaming CDC ingest: the checkpointed twin of cdc/ingest.py.

Replaces the reference's entire hand-rolled incremental machinery —
offset JSON file (S3/K2, enhanced.py:70-101/206-215), `startingOffsets`
arithmetic (S2, :92-101), the 5-minute Airflow cron (U9) — with Structured
Streaming's checkpoint:

  * source progress lives in <checkpoint>/offsets (per-partition, atomic,
    committed AFTER the sink commit — the reference's crash-duplication
    window, SURVEY.md §4 item 3, disappears);
  * `Trigger.AvailableNow` = one drain run, the semantic of each cron tick;
    swap for `processingTime='5 minutes'` to run live;
  * re-running after a crash resumes exactly; re-running with nothing new
    is a no-op.

The transformation chain is byte-identical to the batch path (same
cdc.parse functions compose on a streaming DataFrame — lazy plans don't
care), which is the whole argument for Spark-first design.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..cdc import parse as P


def start_ingest_stream(
    spark: SparkSession,
    event_dir: str,
    table: str,
    out_dir: str,
):
    """Drain all available change events for `table` into the changelog
    parquet sink, exactly-once via the checkpoint. Returns the terminated
    StreamingQuery (AvailableNow stops itself)."""
    env = (
        spark.readStream.schema(P.ENVELOPE_DDL)
        .json(os.path.join(event_dir, f"{table}*.jsonl"))
    )
    flat = P.project_changelog(P.parse_events(env, table), table)
    q = (
        flat.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, f"{table}_parquet"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_checkpoints", table)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
