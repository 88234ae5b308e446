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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .zorder import _STATS_FILE, BLOOM_BITS, _file_stats, prune_files


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    stats_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    ``sort_cols`` pre-sorts rows inside each bucket file (row-group
    stats + read-through merge joins). Overwrites any previous table of
    the same name.

    ``stats_cols`` additionally builds the same per-file skipping
    sidecar the z-order writer emits (min/max + bloom bitmap per column,
    sources/zorder.py) in one extra pass over the written files. The
    pruning physics differ from z-order, and the sidecar is honest about
    it: every bucket file holds a hash-random slice of the table, so
    per-file min/max on a NON-bucket column spans ~the full domain and
    prunes nothing — what prunes here is the BLOOM on equality probes.
    A probe key lives in exactly one bucket, so a bloom hit keeps ~1/n
    of the files (including for the bucket key itself, which lets a
    path-based reader — one with no access to the catalog's bucket
    metadata — skip like the catalog would), and rare values of any
    recorded column skip the files that don't contain them. Bucket,
    in-bucket sort order, and skipping stats land in one layout pass."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    if stats_cols:
        cols = list(dict.fromkeys((bucket_col, *stats_cols)))
        back = spark.read.parquet(path).select(
            F.input_file_name().alias("_file"), *cols
        )
        dtypes = {c: back.schema[c].dataType.simpleString() for c in cols}
        with open(os.path.join(path, _STATS_FILE), "w") as f:
            json.dump(
                {
                    "cols": cols,
                    "zcols": [],  # no Morton clustering — bucketed layout
                    "bucket_col": bucket_col,
                    "n_buckets": n_buckets,
                    "dtypes": dtypes,
                    "bloom_bits": BLOOM_BITS,
                    "files": _file_stats(back, cols),
                },
                f,
            )


def read_bucketed_pruned(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple] | None = None,
    eq: dict[str, object] | None = None,
) -> DataFrame:
    """Scan-shaped read of a bucketed table that consults the skipping
    sidecar and hands Spark only the files that can match. The predicate
    must still be applied on top (file-granular pruning).

    Trade-off, explicit: a path-subset read carries NO bucket metadata,
    so use this for scans/filters; joins that want the zero-Exchange
    bucketed plan must go through ``read_bucketed`` (``spark.table``)
    and scan every file. That is the right split at 100 TB — point
    lookups touch 1/n of the files, co-located joins keep the layout."""
    files = prune_files(spark, path, ranges=ranges, eq=eq)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so this must be ``table()``, not ``read.parquet(path)`` —
    a path read silently loses the bucketing and re-shuffles)."""
    return spark.table(table_name)
