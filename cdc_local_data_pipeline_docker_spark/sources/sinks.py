"""Parquet sinks — the K1/X1 surface, scale-corrected.

The reference forces `coalesce(1)` so every run writes exactly one file
(kafka_to_s3_batch.py:116, kafka_to_s3_enhanced.py:203) — a single-task
bottleneck that serializes the whole write at any scale. Here:

  * natural parallelism: one file per task, AQE coalescing handles the
    small-batch case without collapsing parallelism;
  * date partitioning (`partitionBy(ingest_date)`) so downstream scans
    partition-prune — the layout a 100 TB warehouse actually needs;
  * optional target file sizing via repartition(n) when the caller knows
    the output volume (explicit, never an implicit coalesce(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    date_col: str,
    mode: str = "append",
    target_files_per_partition: int | None = None,
) -> None:
    """Append `df` to a date-partitioned parquet layout.

    The partition column is derived (not consumed) — the original column
    survives in the data files."""
    out = df.withColumn("ingest_date", F.to_date(F.col(date_col)))
    if target_files_per_partition is not None:
        out = out.repartition(target_files_per_partition, "ingest_date")
    out.write.mode(mode).partitionBy("ingest_date").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


from .bucketed import read_bucketed, write_bucketed  # noqa: F401
# Single bucketed-table implementation lives in sources/bucketed.py (the
# external-table variant); re-exported here for back-compat (ADVICE r2).


#: interchange formats the engine round-trips besides parquet
INTERCHANGE_FORMATS = ("orc", "csv", "json")


def write_format(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write a table in an interchange format (ORC for columnar archive,
    CSV/JSON for export). Text formats get an explicit timestamp format
    so the round-trip is lossless to the microsecond."""
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        )
    elif fmt == "json":
        w = w.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    w.save(path)


def read_format(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    """Read an interchange-format table back under an EXPLICIT schema —
    text formats never infer (inference samples the data: nondeterministic
    cost and type drift; ORC carries its own schema but the assert keeps
    the contract uniform)."""
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        )
    elif fmt == "json":
        r = r.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return r.load(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dir whose appends may carry EVOLVED schemas
    (columns added over time — the 'CDC source grew a column' scenario):
    `mergeSchema` unions the footers' schemas; rows written before a
    column existed surface it as NULL. Additive evolution only — renames
    and type changes still need a migration (same contract as Debezium's
    own additive-compatible mode)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
