"""Latest-state materialization: the CDC semantics the reference gets wrong.

The reference appends every change event forever and never consumes delete
tombstones (SURVEY.md §2.B U3: drop.tombstones=false is emitted,
debezium-config.json:22, but no consumer code touches null values) — so its
"warehouse" contains every historical row version with no way to query
current state. Correct semantics (SURVEY.md §4 item 1):

  latest-wins: rank change events per primary key by (partition, offset)
  descending, keep rank 1;
  delete application: if the winning event is a tombstone, the key is gone.

One window over one shuffle on the PK. At 100 TB the same plan holds —
the shuffle is by PK (naturally high-cardinality, no skew), and AQE
handles any hot keys; alternatively `foreachBatch` MERGE for incremental
maintenance (see streaming/)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import CDC_WIRE_SCHEMAS


def latest_state(parsed: DataFrame, table: str) -> DataFrame:
    """Current-table-state view from a parsed change stream.

    Input: `parse.parse_events` output (malformed rows should already be
    quarantined away). Output: one row per live PK with recovered types.

    Ordering note (SURVEY.md §7 hard-item 2): the reference assumes
    partition 0 only (enhanced.py:94-96). Debezium orders a key's events
    within one partition (keyed topics), so (partition, offset) descending
    is a total per-key order even on multi-partition topics."""
    wire = CDC_WIRE_SCHEMAS[table]
    w = Window.partitionBy("pk").orderBy(
        F.col("partition").desc(), F.col("kafka_offset").desc()
    )
    return (
        parsed.filter(~F.col("is_malformed"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_tombstone"))
        .select(
            *[F.col(f"row.{f.name}").alias(f.name) for f in wire.fields],
            F.col("kafka_offset").alias("last_offset"),
        )
    )


def state_counts(parsed: DataFrame) -> DataFrame:
    """Operational summary per event disposition — the engine's analogue of
    the DAG's count-based verification (U8, cdc_auto_sync_every_5min.py:117-184),
    computed in one aggregation instead of psql+mc subprocess counts."""
    return parsed.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("is_tombstone").cast("long")).alias("n_tombstones"),
        F.sum(F.col("is_malformed").cast("long")).alias("n_malformed"),
        F.countDistinct("pk").alias("n_distinct_keys"),
        F.max("kafka_offset").alias("high_watermark"),
    )


def state_as_of(parsed: DataFrame, table: str, offset: int) -> DataFrame:
    """Point-in-time table state: what `latest_state` would have returned
    after consuming offsets <= `offset` — time travel over the retained
    changelog, a capability the reference cannot express at all (its sink
    holds row versions with no replay order consumer; SURVEY.md §4 item 1).

    The offset filter prunes BEFORE the per-key window, so the cost of an
    as-of query scales with the prefix length, not total history; on a
    partitioned changelog (kafka_offset-ranged files) the predicate prunes
    at the scan."""
    return latest_state(parsed.filter(F.col("kafka_offset") <= offset), table)


def compact_changelog(parsed: DataFrame) -> DataFrame:
    """Kafka log compaction over a parsed changelog: the LAST event per
    key, tombstones RETAINED as delete markers, plus fold provenance
    (events folded, offset range). `latest_state` is this minus the
    delete markers; compaction keeps them because downstream consumers
    replaying the compacted log must see the deletes.

    One pk Exchange + sort; the per-key stats ride the SAME window
    partition as the winner ranking, so provenance costs nothing extra.
    Output is ~|keys| rows regardless of history length."""
    pkw = Window.partitionBy("pk")
    w = pkw.orderBy(F.col("partition").desc(), F.col("kafka_offset").desc())
    return (
        parsed.filter(~F.col("is_malformed"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_events_folded", F.count(F.lit(1)).over(pkw))
        .withColumn("first_offset", F.min("kafka_offset").over(pkw))
        .withColumn("last_offset", F.max("kafka_offset").over(pkw))
        .filter(F.col("rn") == 1)
        .select(
            "pk",
            F.when(F.col("is_tombstone"), F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("net_op"),
            "n_events_folded",
            "first_offset",
            "last_offset",
            "row",
        )
    )
