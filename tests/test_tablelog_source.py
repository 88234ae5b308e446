"""format("tablelog") Python DataSource: batch snapshot reads with
executor-side deletion-vector skip + column mapping, and the streaming
source with table versions as offsets (Delta streaming-source shape)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL
from cdc_local_data_pipeline_docker_spark.sources import tablelog_source as TS

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_source_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _drain(spark, root, qname, **opts):
    reader = spark.readStream.format("tablelog").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    ckpt = opts.pop("checkpointLocation", None)
    w = reader.load().writeStream.format("memory").queryName(qname)
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(qname)


def test_batch_source_matches_log_read_with_dvs(spark, root):
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey % 2 = 0"))
    TL.log_append(spark, root, o.filter("o_orderkey % 2 = 1"))
    TL.log_delete_where_mor(spark, root, "o_orderstatus = 'F'")
    via_source = sorted(
        spark.read.format("tablelog").option("path", root).load().collect()
    )
    via_log = sorted(TL.log_read(spark, root).collect())
    assert via_source == via_log
    assert len(via_source) == o.filter("o_orderstatus <> 'F'").count()
    # time travel through the source
    v1 = (
        spark.read.format("tablelog")
        .option("path", root).option("version", 1).load()
    )
    assert v1.count() == o.count()


def test_batch_source_column_mapping_and_evolution(spark, root):
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.limit(10))
    TL.log_rename_column(root, "o_totalprice", "total_price")
    TL.log_append(
        spark, root,
        o.filter("o_orderkey > 1000").limit(5)
         .withColumnRenamed("o_totalprice", "total_price")
         .withColumn("tag", F.lit("late")),
    )
    df = spark.read.format("tablelog").option("path", root).load()
    assert "total_price" in df.columns and "o_totalprice" not in df.columns
    assert "tag" in df.columns
    assert df.count() == 15
    assert df.filter("tag IS NULL").count() == 10  # pre-evolution files
    assert df.filter("total_price IS NULL").count() == 0


def test_stream_appends_exactly_once_and_resume(spark, root):
    """Two sequential drains against one checkpoint (parquet sink — the
    memory sink cannot recover from a checkpoint): the second run must
    read ONLY the commit that arrived in between, and the sink must end
    up with every row exactly once."""
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey % 3 = 0"))
    TL.log_append(spark, root, o.filter("o_orderkey % 3 = 1"))
    ckpt = os.path.join(root, "_stream_ckpt")
    out_dir = os.path.join(root, "_stream_out")

    def drain_to_files():
        q = (
            spark.readStream.format("tablelog")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_to_files()
    n01 = o.filter("o_orderkey % 3 IN (0, 1)").count()
    assert spark.read.parquet(out_dir).count() == n01
    # append a third slice; the resumed stream reads ONLY the new commit
    TL.log_append(spark, root, o.filter("o_orderkey % 3 = 2"))
    drain_to_files()
    sink = spark.read.parquet(out_dir)
    assert sink.count() == o.count()  # exactly once, no re-reads
    assert (
        sink.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )


def test_stream_skips_data_unchanged_commits(spark, root):
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 500"))
    TL.log_compact(spark, root, target_files=1)
    TL.log_rename_column(root, "o_totalprice", "total_price")
    q = f"tl_src_{uuid.uuid4().hex[:8]}"
    got = _drain(spark, root, q)
    assert got.count() == o.filter("o_orderkey < 500").count()


def test_stream_raises_on_change_commit_unless_skipped(spark, root):
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 500"))
    TL.log_delete_where(spark, root, "o_orderstatus = 'F'")
    q = f"tl_src_{uuid.uuid4().hex[:8]}"
    with pytest.raises(Exception, match="skipChangeCommits|STREAM"):
        _drain(spark, root, q)
    q2 = f"tl_src_{uuid.uuid4().hex[:8]}"
    got = _drain(spark, root, q2, skipChangeCommits="true")
    # only the append commit streams; the rewrite commit is skipped whole
    assert got.count() == o.filter("o_orderkey < 500").count()


def test_registry_entries_run(spark):
    out = TS.tablelog_source_snapshot(spark, SF)
    assert out.count() > 0
    out2 = TS.tablelog_source_stream(spark, SF)
    o = _orders(spark)
    assert out2.count() == o.count()


def test_stream_skips_incremental_compaction(spark, root):
    """ADVICE r7: 'compact_small' is content-identical like 'compact' —
    a stream over a table maintained by the incremental OPTIMIZE loop
    streams the appends and nothing else (Delta skips OPTIMIZE)."""
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 200").repartition(4))
    TL.log_append(
        spark, root, o.filter("o_orderkey >= 200 AND o_orderkey < 400")
    )
    TL.log_compact_small_files(spark, root, small_max_rows=10**9)
    q = f"tl_src_{uuid.uuid4().hex[:8]}"
    got = _drain(spark, root, q)
    assert got.count() == o.filter("o_orderkey < 400").count()


def test_stream_over_converted_table(spark, root):
    """ADVICE r7: CONVERT's v0 is adds-only (remove=[]) — a converted
    table must stream its initial data as an append, by commit SHAPE,
    not action name (previously raised, and with skipChangeCommits the
    converted data silently vanished from the stream)."""
    TS.register(spark)
    o = _orders(spark)
    src = tempfile.mkdtemp(prefix="tl_convert_src_")
    try:
        o.filter("o_orderkey < 300").write.mode("overwrite").parquet(src)
        TL.log_convert_in_place(spark, root, src)
        TL.log_append(
            spark, root, o.filter("o_orderkey >= 300 AND o_orderkey < 500")
        )
        q = f"tl_src_{uuid.uuid4().hex[:8]}"
        got = _drain(spark, root, q)
        assert got.count() == o.filter("o_orderkey < 500").count()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_raises_on_restore_unless_skipped(spark, root):
    """ADVICE r7: RESTORE changes table content (rolls back appends) —
    it must hit the raise/skipChangeCommits branch, never be silently
    classified data-unchanged (the sink would diverge from the table)."""
    TS.register(spark)
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 200"))
    TL.log_append(
        spark, root, o.filter("o_orderkey >= 200 AND o_orderkey < 400")
    )
    TL.log_restore(spark, root, 0)
    q = f"tl_src_{uuid.uuid4().hex[:8]}"
    with pytest.raises(Exception, match="skipChangeCommits|STREAM"):
        _drain(spark, root, q)
    q2 = f"tl_src_{uuid.uuid4().hex[:8]}"
    got = _drain(spark, root, q2, skipChangeCommits="true")
    # the two appends stream; the restore commit is skipped whole
    assert got.count() == o.filter("o_orderkey < 400").count()


def test_push_filters_prune_files_and_stay_residual(spark, root):
    """r8 filter pushdown: pushFilters must (a) return EVERY input
    filter as residual (Spark re-evaluates rows — pruning is file-level
    only), (b) plan strictly fewer partitions for a selective predicate
    over a month-partitioned table, and (c) leave results identical to
    the unfiltered-source + DataFrame-filter plan."""
    import datetime

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThanOrEqual,
        StringContains,
    )

    TS.register(spark)
    o = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    TL.log_append(
        spark,
        root,
        o.coalesce(1),
        partition_by=["month(o_orderdate)"],
        stats_cols=["o_orderkey"],
    )
    n_live = len(TL._snapshot(root)["live"])

    fs = [
        GreaterThanOrEqual(("o_orderdate",), datetime.date(1995, 1, 1)),
        LessThanOrEqual(("o_orderdate",), datetime.date(1995, 3, 31)),
        StringContains(("o_orderstatus",), "F"),  # unsupported kind
    ]
    rdr = TS.TablelogReader(root, {})
    residual = list(rdr.pushFilters(fs))
    assert residual == fs  # all returned, by reference
    planned = rdr.partitions()
    assert 0 < len(planned) < n_live
    # stats pruning fires through pushdown too (point on o_orderkey)
    rdr2 = TS.TablelogReader(root, {})
    list(rdr2.pushFilters([EqualTo(("o_orderkey",), 1)]))
    assert len(rdr2.partitions()) < n_live

    # end-to-end exactness through the registered source
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    got = (
        spark.read.format("tablelog")
        .option("path", root)
        .load()
        .filter(
            (F.col("o_orderdate") >= F.lit(lo))
            & (F.col("o_orderdate") <= F.lit(hi))
        )
    )
    exp = o.filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    assert sorted(got.collect()) == sorted(exp.collect())


def test_pushdown_respects_column_mapping_and_time_travel(spark, root):
    """Pushed predicates address LOGICAL names: after RENAME the filter
    on the new name must still prune through the physical partition
    key, and a version-pinned read prunes against that version's
    manifest."""
    import datetime

    TS.register(spark)
    o = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    TL.log_append(
        spark, root, o.coalesce(1), partition_by=["month(o_orderdate)"]
    )
    TL.log_rename_column(root, "o_orderdate", "order_date")
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    got = (
        spark.read.format("tablelog")
        .option("path", root)
        .load()
        .filter(
            (F.col("order_date") >= F.lit(lo))
            & (F.col("order_date") <= F.lit(hi))
        )
    )
    exp = o.filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    assert got.count() == exp.count()
    # reader-level audit through the mapping
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    rdr = TS.TablelogReader(root, {})
    list(
        rdr.pushFilters(
            [
                GreaterThanOrEqual(("order_date",), lo),
                LessThanOrEqual(("order_date",), hi),
            ]
        )
    )
    assert len(rdr.partitions()) < len(TL._snapshot(root)["live"])


def test_pruned_scan_registry_entry(spark):
    out = TS.tablelog_source_pruned_scan(spark, SF)
    o = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    exp = o.filter(
        "o_orderdate BETWEEN DATE '1996-04-01' AND DATE '1996-06-30'"
    ).count()
    assert out.count() == exp
