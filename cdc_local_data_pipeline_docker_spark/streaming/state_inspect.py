"""Streaming state-store observability (Spark 4 `statestore` data
source): read a structured-streaming query's keyed state as a plain
DataFrame — the debugging/repair door every production streaming
deployment eventually needs ("what does the store THINK the running
totals are?"), without replaying the input.

The reader scans the checkpoint's state files directly (no query has to
be running), supports `batchId` time travel across retained snapshots
and per-operator selection for multi-stateful pipelines, and is a
metadata-scale scan: state volume, not input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_query_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """The (key struct, value struct, partition_id) state rows of the
    streaming query checkpointed at ``checkpoint_dir``. ``batch_id``
    time-travels to an earlier retained snapshot; ``operator_id`` picks
    the stateful operator for multi-operator plans (e.g. each side of a
    stream-stream join)."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint_dir)
