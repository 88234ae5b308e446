"""SparkSession factory.

The reference builds its session with only S3A/MinIO credentials and no
tuning (kafka_to_s3_enhanced.py:56-65, kafka_to_s3_batch.py:46-55). Here the
session is configured for analytic work: AQE on (runtime coalescing + skew
join handling), UTC session timezone (so timestamp results are
oracle-comparable), Arrow for the pandas-UDF path, and a shuffle-partition
count sized to the local core count but meant to be overridden on a real
cluster.

At 100 TB these settings are the starting point, not the ceiling:
`spark.sql.shuffle.partitions` should be ~2-3× total executor cores (AQE
coalesces the excess), `maxPartitionBytes` keeps scan tasks ~128 MB, and
broadcast threshold is raised so dimension tables (region/nation/supplier)
never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def s3a_conf(env: dict[str, str] | None = None) -> dict[str, str]:
    """Env-gated object-store (S3/MinIO) configuration — parity with the
    reference's only engine-level config block (kafka_to_s3_enhanced.py:
    56-65: endpoint, path-style access, credentials, SSL off for local
    MinIO). Returns {} unless SPARK_GRAFT_S3_ENDPOINT is set, so purely
    local runs carry no object-store settings."""
    e = os.environ if env is None else env
    endpoint = e.get("SPARK_GRAFT_S3_ENDPOINT")
    if not endpoint:
        return {}
    conf = {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.path.style.access": e.get(
            "SPARK_GRAFT_S3_PATH_STYLE", "true"
        ),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": e.get(
            "SPARK_GRAFT_S3_SSL", "false"
        ),
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }
    if e.get("SPARK_GRAFT_S3_ACCESS_KEY"):
        conf["spark.hadoop.fs.s3a.access.key"] = e["SPARK_GRAFT_S3_ACCESS_KEY"]
    if e.get("SPARK_GRAFT_S3_SECRET_KEY"):
        conf["spark.hadoop.fs.s3a.secret.key"] = e["SPARK_GRAFT_S3_SECRET_KEY"]
    return conf


def get_spark(
    app_name: str = "cdc-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local tests run ``local[$SPARK_GRAFT_CPUS]``; on a cluster, pass
    ``master=None`` with an externally-configured session and this only
    applies the SQL-level configs.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python data-source filter pushdown (4.1, default false): the
        # tablelog DataSource prunes files from pushed comparisons; with
        # the conf off Spark refuses to plan filtered reads over readers
        # that implement pushFilters (also set by tablelog_source.register)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MB splits are right for a cluster; the local testdata tables
        # are ~1-10 MB files, so benches override via env to split scans
        # across cores (SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in s3a_conf().items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
