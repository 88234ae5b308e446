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
from pyspark.sql import functions as F

from ..catalog import CDC_WIRE_SCHEMAS
from ..cdc import parse as P


def start_ingest_stream(
    spark: SparkSession,
    event_dir: str,
    table: str,
    out_dir: str,
    use_custom_source: bool = False,
):
    """Drain all available change events for `table` into the changelog
    parquet sink, exactly-once via the checkpoint. Returns the terminated
    StreamingQuery (AvailableNow stops itself).

    ``use_custom_source=True`` swaps the generic json file stream for the
    registered ``cdc_events`` Python Data Source (sources/pydatasource) —
    same envelope schema, per-file partitions, offset-dict checkpointing —
    proving the custom source is a drop-in for the whole ingest chain."""
    if use_custom_source:
        from ..sources import pydatasource as PDS

        PDS.register(spark)
        env = (
            spark.readStream.format("cdc_events")
            .option("path", os.path.join(event_dir, f"{table}.jsonl"))
            .load()
        )
    else:
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


def start_multi_topic_ingest(
    spark: SparkSession,
    event_dir: str,
    out_dir: str,
    tables: tuple[str, ...] | None = None,
):
    """ONE streaming query over ALL table-topics (U7 consolidation).

    The reference fans out one Airflow task per table, each with its own
    offset file and Spark submit (cdc_auto_sync_every_5min.py:220-242).
    Here a single query subscribes to every topic at once — the file
    fixture's `*.jsonl` glob is the stand-in for Kafka's
    ``subscribePattern`` — and fans out per-table inside ``foreachBatch``:
    one source scan, ONE checkpoint tracking progress for all topics,
    N table sinks. Per-table schema dispatch (P3) happens on the shared
    micro-batch, which is persisted so N sink writes cost one scan.

    foreachBatch sinks are at-least-once on batch retry; replayed appends
    collapse downstream because latest-state dedups by (pk, partition,
    offset) — same idempotence argument as the batch path."""
    tables = tuple(tables or CDC_WIRE_SCHEMAS)
    env = spark.readStream.schema(P.ENVELOPE_DDL).json(
        os.path.join(event_dir, "*.jsonl")
    )

    def _fan_out(batch_df, _batch_id: int) -> None:
        batch_df.persist()
        try:
            for table in tables:
                # topic names are <server>.<schema>.<table>; the trailing
                # ".<table>" match is the dispatch key (order_items never
                # collides with orders — the dot anchors the full name)
                sub = batch_df.filter(F.col("topic").endswith(f".{table}"))
                flat = P.project_changelog(P.parse_events(sub, table), table)
                flat.write.mode("append").parquet(
                    os.path.join(out_dir, f"{table}_parquet")
                )
        finally:
            batch_df.unpersist()

    q = (
        env.writeStream.foreachBatch(_fan_out)
        .option(
            "checkpointLocation",
            os.path.join(out_dir, "_checkpoints", "_all_topics"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
