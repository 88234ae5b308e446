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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

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

    def streamReader(self, schema) -> "CdcEventsStreamReader":
        return CdcEventsStreamReader(self.options)


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
                yield _emit(rec)


def _emit(rec: dict):
    """One envelope tuple in CDC_EVENTS_SCHEMA order."""
    return (
        rec.get("key"),
        rec.get("value"),
        rec.get("topic"),
        rec.get("partition"),
        rec.get("offset"),
        rec.get("timestamp"),
    )


class _FileSlice(InputPartition):
    """(file, start_line, end_line) — the executor-side read unit."""

    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


class CdcEventsStreamReader(DataSourceStreamReader):
    """spark.readStream.format("cdc_events").option("path", dir).load()

    Micro-batch source over the same JSONL envelope files, modeled on how
    the Kafka source tracks progress: the stream OFFSET is a dict
    {file -> lines consumed} (the per-topic-partition offset map), and
    each micro-batch reads the [start, end) line slices that appeared
    since the last batch — one input partition PER GROWN FILE, so a batch
    over N topic files parallelizes exactly like N Kafka partitions.

    `latestOffset` counts lines per file on the driver — right for the
    fixture/file transport where the driver owns discovery (the built-in
    file source also lists on the driver); a queue transport would ask the
    broker API instead of counting. Appends are the only legal mutation
    (like a log), so slices never re-read history; the checkpoint persists
    the offset dict and replays an interrupted batch's exact slices
    (exactly-once with the parquet sink's transactional commit).

    The batch reader's `startingOffset` RECORD-level pushdown applies here
    too: resume-from-watermark skips consumed records inside the reader."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_events source requires .option('path', ...)")
        self.starting_offset = int(options.get("startingoffset", -1))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        return [self.path]

    def initialOffset(self) -> dict:
        return {"lines": {}}

    def latestOffset(self) -> dict:
        counts: dict[str, int] = {}
        for f in self._files():
            n = 0
            with open(f) as fh:
                for line in fh:
                    if line.strip():
                        n += 1
            counts[f] = n
        return {"lines": counts}

    def partitions(self, start: dict, end: dict):
        prev = start.get("lines", {})
        out = []
        for f, hi in end.get("lines", {}).items():
            lo = prev.get(f, 0)
            if hi > lo:
                out.append(_FileSlice(f, lo, hi))
        # A fully-caught-up batch still needs ≥1 (empty) partition for
        # Spark to run the no-op micro-batch.
        return out or [_FileSlice("", 0, 0)]

    def read(self, partition: "_FileSlice"):
        if not partition.path:
            return
        i = 0
        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                if i >= partition.end:
                    break
                if i >= partition.start:
                    rec = json.loads(line)
                    if rec.get("offset", 0) > self.starting_offset:
                        yield _emit(rec)
                i += 1

    def commit(self, end: dict) -> None:
        pass  # progress is durable in the streaming checkpoint


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(CdcEventsDataSource)
