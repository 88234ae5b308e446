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


def stream_state_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED form of the state-store reader: drain a keyed streaming
    aggregation over the events stream (AvailableNow, one micro-batch),
    then read the answer back FROM THE STATE FILES — not the sink — and
    return (user_id, n_events, total_value). The DuckDB oracle is the
    plain batch aggregate, so the entry proves end-to-end that what the
    state store holds IS the answer (the property an operator repair /
    state-migration tool relies on).

    The state rows are one per user (KBs at any corpus size — state is
    the AGGREGATE, never the input), so they come back via Arrow into a
    local frame after the checkpoint is removed; the heavy work
    (aggregation) ran in the streaming query."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .jobs import _events_stream

    ckpt = tempfile.mkdtemp(prefix="state_snapshot_ckpt_")
    try:
        s = _events_stream(spark, sf_dir)
        agg = s.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination returns False on timeout with the query still
        # running — reading the checkpoint then would see a partial
        # commit log (ADVICE r6). Stop and fail loudly instead.
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(
                "stream_state_snapshot: AvailableNow drain exceeded 600 s"
            )
        pdf = (
            read_query_state(spark, ckpt)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.count").alias("n_events"),
                F.col("value.sum").cast("double").alias("total_value"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.createDataFrame(pdf)
        .select("user_id", "n_events", "total_value")
        .orderBy("user_id")
    )


STREAM_STATE_SNAPSHOT_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""
