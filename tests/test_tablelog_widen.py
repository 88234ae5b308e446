"""ALTER COLUMN ... TYPE — metadata-only type widening (r13, the
Delta 4.0 shape): the manifest records the widened type per physical
column, scans pass an explicit schema (Spark 4's parquet readers
upcast narrower file types natively), and pre-widen/post-widen files
coexist under one snapshot. Only widening moves are legal; skipping
metadata recorded under the old type stops being used (safe-only)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_widen_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_widen_int_to_long_mixed_files(spark, root):
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    v = TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN v TYPE BIGINT")
    m = TL._read_manifest(root, v)
    assert m["add"] == [] and m["remove"] == []  # zero data I/O
    got = TL.log_read(spark, root)
    assert dict(got.dtypes)["v"] == "bigint"
    assert {r.k: r.v for r in got.collect()} == {1: 10, 2: 20}
    # values only a LONG can hold land beside the old int32 files
    TL.log_append(
        spark, root, spark.createDataFrame([(3, 2**40)], "k INT, v LONG")
    )
    got = {r.k: r.v for r in TL.log_read(spark, root).collect()}
    assert got == {1: 10, 2: 20, 3: 2**40}
    # time travel: the pre-widen version keeps the old type
    assert dict(TL.log_read(spark, root, version=0).dtypes)["v"] == "int"


def test_widen_survives_every_writer_class(spark, root):
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN v TYPE BIGINT")
    TL.log_append(
        spark, root, spark.createDataFrame([(3, 2**40)], "k INT, v LONG")
    )
    # CoW update over mixed-type files
    TL.log_update_where(spark, root, "k = 1", {"v": str(2**41)})
    # MoR delete over mixed-type files
    TL.log_delete_where_mor(spark, root, "k = 2")
    # merge over mixed-type files
    TL.log_merge(
        spark,
        root,
        spark.createDataFrame([(4, 7)], "k INT, v LONG"),
        "k",
    )
    # full compact materializes one widened-type file set
    TL.log_compact(spark, root, target_files=1)
    got = {r.k: r.v for r in TL.log_read(spark, root).collect()}
    assert got == {1: 2**41, 3: 2**40, 4: 7}
    assert dict(TL.log_read(spark, root).dtypes)["v"] == "bigint"


def test_widen_matrix_and_refusals(spark, root):
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 1.5)], "k INT, x FLOAT")
    )
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN x TYPE DOUBLE")
    TL.log_sql(
        spark, f"ALTER TABLE `{root}` ALTER COLUMN k TYPE DECIMAL(20,0)"
    )
    dt = dict(TL.log_read(spark, root).dtypes)
    assert dt["x"] == "double" and dt["k"] == "decimal(20,0)"
    assert TL.log_read(spark, root).collect()[0].x == 1.5
    # chained widening composes (decimal grows again)
    TL.log_sql(
        spark, f"ALTER TABLE `{root}` ALTER COLUMN k TYPE DECIMAL(30,2)"
    )
    assert dict(TL.log_read(spark, root).dtypes)["k"] == "decimal(30,2)"
    # narrowing / sideways moves refuse
    for bad in ("INT", "DECIMAL(30,1)", "STRING"):
        with pytest.raises(ValueError, match="widening"):
            TL.log_alter_column_type(root, "k", bad)
    with pytest.raises(ValueError, match="no such column"):
        TL.log_alter_column_type(root, "nope", "bigint")
    # int -> decimal without enough integer digits refuses
    with pytest.raises(ValueError, match="widening"):
        TL.log_alter_column_type(root, "x", "float")


def test_widen_refuses_bucket_partitioned_column(spark, root):
    TL.log_append(
        spark,
        root,
        spark.createDataFrame([(k, k) for k in range(8)], "k INT, v INT"),
        partition_by=["bucket(4, k)"],
    )
    with pytest.raises(ValueError, match="bucket"):
        TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN k TYPE BIGINT")
    # non-bucketed columns still widen
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN v TYPE BIGINT")
    assert dict(TL.log_read(spark, root).dtypes)["v"] == "bigint"


def test_widen_on_column_mapped_table(spark, root):
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 5)], "k INT, v INT")
    )
    TL.log_rename_column(root, "v", "val")
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN val TYPE BIGINT")
    got = TL.log_read(spark, root)
    assert dict(got.dtypes)["val"] == "bigint"
    assert got.collect()[0].val == 5
    # renaming after the widen keeps the widened type (physical key)
    TL.log_rename_column(root, "val", "amount")
    assert dict(TL.log_read(spark, root).dtypes)["amount"] == "bigint"


def test_widen_on_datasource_and_sql_view(spark, root):
    from cdc_local_data_pipeline_docker_spark.sources.tablelog_source import (
        register,
        register_sql_view,
    )

    register(spark)
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 10)], "k INT, v INT")
    )
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN v TYPE BIGINT")
    TL.log_append(
        spark, root, spark.createDataFrame([(2, 2**40)], "k INT, v LONG")
    )
    df = spark.read.format("tablelog").option("path", root).load()
    assert dict(df.dtypes)["v"] == "bigint"
    assert {r.k: r.v for r in df.collect()} == {1: 10, 2: 2**40}
    register_sql_view(spark, "widen_view", root)
    try:
        out = spark.sql("SELECT SUM(v) AS s FROM widen_view").first()
        assert out.s == 10 + 2**40
    finally:
        spark.catalog.dropTempView("widen_view")


def test_widen_cdf_and_checkpoint_carry(spark, root):
    """The change feed reads widened across the boundary, and the
    widen map folds through a checkpoint."""
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 10)], "k INT, v INT")
    )
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN v TYPE BIGINT")
    TL.log_delete_where(spark, root, "k = 1")  # CoW rewrite: CDF sides
    add, rem = TL.log_changes(spark, root, 2)
    assert rem is not None and rem.collect()[0].v == 10
    assert dict(rem.dtypes)["v"] == "bigint"
    TL.log_checkpoint(root)
    st = TL._snapshot(root)
    assert st["widen"] == {"v": "bigint"}
    TL.log_append(
        spark, root, spark.createDataFrame([(9, 2**40)], "k INT, v LONG")
    )
    assert {r.k: r.v for r in TL.log_read(spark, root).collect()} == {
        9: 2**40
    }


def test_widen_strips_stats_pruning_safely(spark, root):
    """Skipping metadata recorded under the old type stops being used —
    point lookups and range reads stay CORRECT (scan instead of skip)."""
    TL.log_append(
        spark,
        root,
        spark.createDataFrame([(k, k) for k in range(100)], "k INT, v INT"),
        stats_cols=["k"],
    )
    TL.log_sql(spark, f"ALTER TABLE `{root}` ALTER COLUMN k TYPE BIGINT")
    st = TL._snapshot(root)
    assert all("k" not in s for s in st["stats"].values())
    got = TL.log_read(spark, root, prune=("k", 10, 20)).filter(
        "k BETWEEN 10 AND 20"
    )
    assert got.count() == 11
