"""URI-encoding regression pins (ADVICE r9 high): Spark 3.4+ returns
``_metadata.file_path`` / ``input_file_name()`` as PERCENT-ENCODED
``file:`` URIs, so any path comparison against the manifest's decoded
relative paths must decode first. Before the fix, a table root
containing a space made `_read_with_dv` silently drop every deletion
vector (deleted rows resurrected in log_read and in CoW rewrites), and
a hive partition VALUE containing a space broke the affected-file
matching in CoW DELETE/UPDATE/MERGE."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

SF = "/root/testdata/sf0.001"
COLS = ["o_orderkey", "o_orderstatus", "o_totalprice"]


@pytest.fixture()
def spaced_root():
    d = tempfile.mkdtemp(prefix="tablelog uri test ")  # spaces on purpose
    assert " " in d
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        *COLS
    )


def test_uri_to_path_decodes_scheme_and_percent():
    assert TL._uri_to_path("file:///a%20b/c.parquet") == "/a b/c.parquet"
    assert TL._uri_to_path("file:/a%20b/c.parquet") == "/a b/c.parquet"
    # '+' in a URI path is a literal plus, not a space
    assert TL._uri_to_path("file:///a+b/c%2Bd") == "/a+b/c+d"
    assert TL._uri_to_path("/plain/path") == "/plain/path"
    # ADVICE r10: a NON-URI input is returned unchanged — a plain path
    # containing a literal %XX sequence must not be percent-decoded
    assert TL._uri_to_path("/plain/100%20off/p.parquet") == (
        "/plain/100%20off/p.parquet"
    )


def test_mor_delete_with_space_in_root(spark, spaced_root):
    """The advisor's repro: MoR delete of half the rows must not
    resurrect them when the root contains a space."""
    orders = _orders(spark).limit(10)
    TL.log_append(spark, spaced_root, orders)
    total = TL.log_read(spark, spaced_root).count()
    assert total == 10
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    dead = keys[:5]
    TL.log_delete_where_mor(
        spark,
        spaced_root,
        "o_orderkey in (%s)" % ",".join(str(k) for k in dead),
    )
    out = TL.log_read(spark, spaced_root)
    assert out.count() == 5
    left = {r[0] for r in out.select("o_orderkey").collect()}
    assert left == set(keys[5:])


def test_cow_delete_with_space_in_partition_value(spark, spaced_root):
    """Partition directories hive-encode values; a value with a space
    must still match in the CoW affected-file probe."""
    df = _orders(spark).limit(8).withColumn(
        "seg", F.when(F.col("o_orderkey") % 2 == 0, F.lit("A B")).otherwise(
            F.lit("plain")
        )
    )
    TL.log_append(spark, spaced_root, df, partition_by=["identity(seg)"])
    assert TL.log_read(spark, spaced_root).count() == 8
    n_ab = TL.log_read(spark, spaced_root).filter("seg = 'A B'").count()
    assert n_ab > 0
    TL.log_delete_where(spark, spaced_root, "seg = 'A B'")
    out = TL.log_read(spark, spaced_root)
    assert out.count() == 8 - n_ab
    assert out.filter("seg = 'A B'").count() == 0


def test_mor_delete_then_cow_update_spaced_root(spark, spaced_root):
    """CoW UPDATE rewrites through deletion vectors: rows deleted by a
    prior MoR commit must not resurrect in the rewritten files."""
    orders = _orders(spark).limit(10)
    TL.log_append(spark, spaced_root, orders)
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    TL.log_delete_where_mor(spark, spaced_root, f"o_orderkey = {keys[0]}")
    TL.log_update_where(
        spark,
        spaced_root,
        "o_totalprice > -1",  # touches every file
        {"o_orderstatus": "'X'"},
    )
    out = TL.log_read(spark, spaced_root)
    assert out.count() == 9
    assert out.filter(f"o_orderkey = {keys[0]}").count() == 0
    assert out.filter("o_orderstatus = 'X'").count() == 9


def test_datasource_paths_with_space_in_root(spark, spaced_root):
    """The Python DataSource stack (snapshot read, batch CDF) on a
    table root containing a space: the reader resolves files with
    plain filesystem paths (pyarrow), and the Spark-side DV logic is
    the decoded-join path pinned above — end-to-end the deleted rows
    stay dead through format('tablelog')."""
    from cdc_local_data_pipeline_docker_spark.sources import (
        tablelog_source as TS,
    )

    orders = _orders(spark).limit(12)
    TL.log_append(spark, spaced_root, orders)
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    TL.log_delete_where_mor(
        spark, spaced_root, f"o_orderkey in ({keys[0]}, {keys[1]})"
    )
    TS.register(spark)
    snap = (
        spark.read.format("tablelog").option("path", spaced_root).load()
    )
    got = sorted(r["o_orderkey"] for r in snap.collect())
    assert got == keys[2:]
    cdf = (
        spark.read.format("tablelog")
        .option("path", spaced_root)
        .option("readChangeFeed", "true")
        .load()
    )
    dead = sorted(
        r["o_orderkey"]
        for r in cdf.filter("_change_type = 'delete'").collect()
    )
    assert dead == keys[:2]


def test_row_ids_with_space_in_root(spark, spaced_root):
    """Row tracking joins its base map on the decoded path — pin it on
    a spaced root too."""
    orders = _orders(spark).limit(8)
    TL.log_append(spark, spaced_root, orders)
    ids = {
        r["o_orderkey"]: r["_row_id"]
        for r in TL.log_read_with_row_ids(spark, spaced_root).collect()
    }
    assert len(ids) == 8 and len(set(ids.values())) == 8
