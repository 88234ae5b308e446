"""Bucketed table writes: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders,
changelog x changelog) is the shuffle of both sides on the join key —
every run, every query. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed bucket count
inside each output directory, and Catalyst then plans joins and
aggregations on the bucket key with NO Exchange on the bucketed side
(both sides bucketed on the same key with the same count -> zero-shuffle
sort-merge join; ``sortBy`` additionally pre-sorts each bucket file so
even the merge-sort is read-through).

This is the storage-layout analogue of the reference's single-partition
parquet outputs — except it scales: bucket count is chosen once per
table (rows_per_bucket ~ executor-memory-sized), and every downstream
join/groupBy on the key rides the layout for free.

Spark requires bucketed data to live in the catalog (buckets are a
table property, not a parquet property), so writes go through
``saveAsTable`` with an explicit ``path`` — an external table: the
catalog entry is metadata only, the files stay where the pipeline puts
them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    ``sort_cols`` pre-sorts rows inside each bucket file (row-group
    stats + read-through merge joins). Overwrites any previous table of
    the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so this must be ``table()``, not ``read.parquet(path)`` —
    a path read silently loses the bucketing and re-shuffles)."""
    return spark.table(table_name)
