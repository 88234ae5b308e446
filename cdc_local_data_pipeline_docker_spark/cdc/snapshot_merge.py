"""DBLog-style incremental snapshot + changelog merge.

The reference's pipeline assumes Debezium completes a FULL table snapshot
before streaming begins (debezium-config.json `snapshot.mode`) — a
non-starter at 100 TB, where a blocking snapshot would stall the stream
for hours and hold a long transaction open. The production answer
(Netflix DBLog, adopted as Debezium's *incremental snapshot*) snapshots
the table in PK-range CHUNKS interleaved with the live changelog: each
chunk is read at some point while changes keep flowing, and a per-chunk
WATERMARK records the changelog position the chunk's rows reflect.

The merge rule that makes the union consistent (the DBLog theorem):

  for each key, the CHANGELOG WINS iff the key's last change offset is
  past its chunk's watermark (the snapshot row is stale or the key was
  touched after being snapshotted); otherwise the SNAPSHOT row is the
  final state. Tombstone winners drop the key.

`merge_incremental_snapshot` implements exactly that as ONE aggregation:
events get their chunk's watermark via a range join against the tiny
chunk-spec table (broadcast — a chunk list is bounded by table_size /
chunk_size rows of 4 ints, KB-to-MB at any scale), then one pk-keyed
`max_by` pass extracts both the overall last event and the last event at
or before the watermark (the snapshot image). One Exchange, hash
aggregate, no window sort; output is ~|keys| rows.

At 100 TB the changelog side prunes to `offset > min(watermarks)` at the
scan (offset-sorted files, sources/sinks.write_changelog_sorted), and the
snapshot side is chunk-parallel by construction — every chunk is an
independent bounded PK-range scan. The correctness theorem is
hypothesis-swept on random logs × random chunkings in
tests/test_hypothesis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: chunk spec schema: half-open pk ranges [pk_lo, pk_hi) MUST partition
#: the key space; watermark_offset = last changelog offset reflected in
#: the chunk's snapshot rows.
CHUNKS_DDL = "chunk_id INT, pk_lo INT, pk_hi INT, watermark_offset BIGINT"


def merge_incremental_snapshot(parsed: DataFrame, chunks: DataFrame) -> DataFrame:
    """Merge chunked-snapshot state with the full changelog.

    `parsed` is a parsed changelog (cdc/parse.parse_events shape). The
    snapshot side is DERIVED here — the last event at or before each
    chunk's watermark IS the row the chunk read — which keeps the
    operator self-contained and lets tests prove the theorem:
    merged ≡ latest_state(full log) for ANY chunking.

    Returns one row per LIVE key: pk, chunk_id, watermark_offset, src
    ('log' | 'snapshot'), row (winner image), last_offset (full-log).
    """
    ev = parsed.filter(~F.col("is_malformed"))
    evc = ev.join(
        F.broadcast(chunks),
        (ev.pk >= chunks.pk_lo) & (ev.pk < chunks.pk_hi),
    )
    order_key = F.struct("partition", "kafka_offset")
    per_pk = evc.groupBy("pk", "chunk_id", "watermark_offset").agg(
        F.max_by(
            F.struct("is_tombstone", "row", "kafka_offset"), order_key
        ).alias("last_ev"),
        # max_by skips rows whose ordering value is NULL -> restricting
        # the candidate set to offset <= watermark needs no second pass
        F.max_by(
            F.struct("is_tombstone", "row"),
            F.when(F.col("kafka_offset") <= F.col("watermark_offset"), order_key),
        ).alias("snap_ev"),
    )
    log_wins = F.col("last_ev.kafka_offset") > F.col("watermark_offset")
    keep = F.when(log_wins, ~F.col("last_ev.is_tombstone")).otherwise(
        F.col("snap_ev").isNotNull() & ~F.col("snap_ev.is_tombstone")
    )
    return per_pk.filter(keep).select(
        "pk",
        "chunk_id",
        "watermark_offset",
        F.when(log_wins, F.lit("log")).otherwise(F.lit("snapshot")).alias("src"),
        F.when(log_wins, F.col("last_ev.row"))
        .otherwise(F.col("snap_ev.row"))
        .alias("row"),
        F.col("last_ev.kafka_offset").alias("last_offset"),
    )
