"""Custom stateful streaming operator via applyInPandasWithState:
per-user running totals maintained across micro-batches.

This is the §2.C "custom stateful operator" row — the escape hatch for
streaming logic that watermarked aggregation can't express (per-key
user-defined state machines: running CLV, fraud counters, session
enrichment). State is a per-key tuple held by the state store, updated
one pandas batch per key per micro-batch; timeouts are available for
state expiry (not used here — the fixture stream is bounded).

Correctness contract: totals are monotone per user, so after draining the
bounded stream, the LAST update per user equals the batch GROUP BY — which
is how the registry entry gets an exact SQL oracle despite the stateful
path emitting one update row per (user, batch).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .jobs import _events_stream

#: Output of each state update: one row per (user, batch).
_OUTPUT_DDL = "user_id LONG, n_events LONG, total_cents LONG"
_STATE_DDL = "n LONG, cents LONG"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into (count, cents) state.

    Money is tracked in integer cents — exact accumulation independent of
    batch boundaries (float state would drift with batching)."""
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-ROW cent rounding before summation: batch-level rounding of a
        # float sum would not exactly equal the oracle's per-row semantics
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
    )


def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event counts and value totals, maintained in the
    state store; after the drain, the final update per user must equal the
    batch aggregate (the oracle)."""
    s = _events_stream(spark, sf_dir).select("user_id", "ts", "value")
    updates = s.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUTPUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"st_{uuid.uuid4().hex[:12]}"
    q = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    # totals are monotone → the max row per user is the final state
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("total_cents").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id")
    )


STREAM_STATEFUL_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY user_id
ORDER BY user_id
"""
