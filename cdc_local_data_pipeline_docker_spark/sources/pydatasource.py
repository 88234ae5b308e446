"""Custom Python Data Source (Spark 4 API) for the CDC change-event wire
format — the JSONL envelope the fixtures emit and a Kafka consumer would
deliver (ROADMAP item 7).

This wraps the wire format as a first-class `spark.read.format("cdc_events")`
source instead of a generic json read:

  * fixed envelope schema (never inferred),
  * one input partition per event file → reads parallelize across files
    exactly like Kafka partitions parallelize across consumers,
  * offset predicate pushdown via `.option("startingOffset", n)` — rows at
    or below the watermark are skipped INSIDE the reader (the S2
    offset-bounded-scan semantic, kafka_to_s3_enhanced.py:146), so resume
    runs never materialize already-consumed events.

The reader yields plain tuples; Spark's Python data source machinery
Arrow-batches them across the boundary. For the 100 TB framing this is
the template for wrapping any custom wire/queue format the built-in
sources don't speak — partition-per-shard, pushdown-at-reader.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Envelope schema — matches cdc/parse.ENVELOPE_DDL.
CDC_EVENTS_SCHEMA = (
    "key STRING, value STRING, topic STRING, partition INT, "
    "offset LONG, timestamp LONG"
)


class CdcEventsDataSource(DataSource):
    """spark.read.format("cdc_events").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "cdc_events"

    def schema(self) -> str:
        return CDC_EVENTS_SCHEMA

    def reader(self, schema) -> "CdcEventsReader":
        return CdcEventsReader(self.options)


class CdcEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_events source requires .option('path', ...)")
        # option keys arrive lower-cased
        self.starting_offset = int(options.get("startingoffset", -1))

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition):
        start = self.starting_offset
        with open(partition.value) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("offset", 0) <= start:
                    continue  # offset pushdown: skip consumed rows here
                yield (
                    rec.get("key"),
                    rec.get("value"),
                    rec.get("topic"),
                    rec.get("partition"),
                    rec.get("offset"),
                    rec.get("timestamp"),
                )


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(CdcEventsDataSource)
