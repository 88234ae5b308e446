"""Delta manifests + parquet checkpoints, column mapping, and bloom
file skipping for the tablelog format — the million-file-regime rungs
on top of the core protocol covered by test_tablelog.py."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_v2_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# delta manifests + checkpoints
# ---------------------------------------------------------------------------

def test_manifests_are_commit_sized_not_table_sized(spark, root):
    """The delta-log property itself: manifest bytes must NOT grow with
    the number of live files — commit #14 on a 15-commit table is the
    same size as commit #2 (the legacy format grew O(live files))."""
    o = _orders(spark)
    for i in range(15):
        TL.log_append(spark, root, o.filter(F.col("o_orderkey") % 15 == i),
                      stats_cols=["o_orderkey"])
    sizes = {
        v: os.path.getsize(
            os.path.join(root, "_log", TL._manifest_name(v))
        )
        for v in TL._versions(root)
    }
    # no "live" key anywhere; later manifests within 2x of early ones
    for v in TL._versions(root):
        assert "live" not in TL._read_manifest(root, v)
    assert sizes[14] < 2 * sizes[2]
    # resolution still sees the whole table
    assert len(TL._snapshot(root)["live"]) >= 15
    assert TL.log_read(spark, root).count() == o.count()


def test_cadence_checkpoint_written_and_equivalent(spark, root):
    o = _orders(spark)
    for i in range(12):
        TL.log_append(spark, root, o.filter(F.col("o_orderkey") % 12 == i))
    cks = TL._checkpoint_versions(root)
    assert TL.CHECKPOINT_INTERVAL in cks
    # checkpointed resolution == pure-replay resolution, at the ckpt
    # version AND past it
    for v in (TL.CHECKPOINT_INTERVAL, 11):
        with_ck = TL._snapshot(root, v)
        saved = os.path.join(root, "_ckpt_saved")
        shutil.move(TL._ckpt_dir(root, TL.CHECKPOINT_INTERVAL), saved)
        try:
            assert TL._snapshot(root, v) == with_ck
        finally:
            shutil.move(saved, TL._ckpt_dir(root, TL.CHECKPOINT_INTERVAL))
    # a CORRUPT checkpoint is skipped, not trusted
    with open(
        os.path.join(
            TL._ckpt_dir(root, TL.CHECKPOINT_INTERVAL), "files.parquet"
        ),
        "wb",
    ) as fh:
        fh.write(b"garbage")
    assert TL.log_read(spark, root).count() == o.count()


def test_explicit_checkpoint_and_pointer(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.limit(100))
    TL.log_append(spark, root, o.limit(200))
    v = TL.log_checkpoint(root)
    assert v == 1
    with open(os.path.join(root, "_log", "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == 1
    assert TL._read_checkpoint(root, 1)["live"] == TL._snapshot(root, 1)["live"]


def test_vacuum_trim_writes_replay_base(spark, root):
    """Trimming history below the oldest retained version must leave the
    log resolvable: vacuum writes a checkpoint base when none exists."""
    o = _orders(spark)
    for i in range(6):
        TL.log_append(spark, root, o.filter(F.col("o_orderkey") % 6 == i))
    n = TL.log_read(spark, root).count()
    TL.log_vacuum(root, retain_versions=2)
    assert TL._versions(root) == [4, 5]
    # a base at or below v4 exists and both retained versions resolve
    assert any(c in (3, 4) for c in TL._checkpoint_versions(root))
    assert TL.log_read(spark, root).count() == n
    assert TL.log_read(spark, root, version=4).count() < n


# ---------------------------------------------------------------------------
# column mapping
# ---------------------------------------------------------------------------

def test_rename_column_is_metadata_only(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 800"))
    files_before = set(TL._snapshot(root)["live"])
    v = TL.log_rename_column(root, "o_totalprice", "total_price")
    m = TL._read_manifest(root, v)
    assert m["add"] == [] and m["remove"] == []  # zero data I/O
    assert set(TL._snapshot(root)["live"]) == files_before
    snap = TL.log_read(spark, root)
    assert "total_price" in snap.columns
    assert "o_totalprice" not in snap.columns
    # values unchanged under the new name
    want = sorted(r[0] for r in o.filter("o_orderkey < 800")
                  .select("o_totalprice").collect())
    got = sorted(r[0] for r in snap.select("total_price").collect())
    assert got == want
    # time travel BEFORE the rename shows the original name
    snap0 = TL.log_read(spark, root, version=0)
    assert "o_totalprice" in snap0.columns and "total_price" not in snap0.columns


def test_append_after_rename_unifies_physically(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey % 2 = 0"))
    TL.log_rename_column(root, "o_totalprice", "total_price")
    TL.log_append(
        spark, root,
        o.filter("o_orderkey % 2 = 1")
         .withColumnRenamed("o_totalprice", "total_price"),
    )
    snap = TL.log_read(spark, root)
    assert snap.count() == o.count()
    # both eras' rows carry non-null prices under the logical name —
    # i.e. the post-rename append landed in the SAME physical column
    assert snap.filter("total_price IS NULL").count() == 0
    # physical files written after the rename still use the original
    # physical column name (name-mapping, not rewrite)
    state = TL._snapshot(root)
    assert state["colmap"]["total_price"] == "o_totalprice"


def test_drop_column_metadata_only_and_time_travel(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.limit(300))
    v = TL.log_drop_column(root, "o_orderstatus")
    m = TL._read_manifest(root, v)
    assert m["add"] == [] and m["remove"] == []
    snap = TL.log_read(spark, root)
    assert set(snap.columns) == {"o_orderkey", "o_totalprice"}
    # pre-drop version still shows it
    assert "o_orderstatus" in TL.log_read(spark, root, version=0).columns
    # delete with a predicate over surviving logical columns works
    TL.log_delete_where(spark, root, "o_orderkey % 2 = 0")
    got = TL.log_read(spark, root)
    assert got.filter("o_orderkey % 2 = 0").count() == 0
    assert set(got.columns) == {"o_orderkey", "o_totalprice"}
    # compaction crosses the mapping content-identically
    before = sorted(got.collect())
    TL.log_compact(spark, root, target_files=1)
    assert sorted(TL.log_read(spark, root).collect()) == before


def test_append_new_column_extends_mapping(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.limit(10))
    TL.log_rename_column(root, "o_orderstatus", "status")
    TL.log_append(
        spark, root,
        o.filter("o_orderkey > 1000").limit(5)
         .withColumnRenamed("o_orderstatus", "status")
         .withColumn("tag", F.lit("late")),
    )
    snap = TL.log_read(spark, root)
    assert "tag" in snap.columns and "status" in snap.columns
    assert snap.filter("tag = 'late'").count() == 5
    assert snap.filter("tag IS NULL").count() == 10


def test_merge_and_delete_use_logical_key_names(spark, root):
    o = _orders(spark)
    TL.log_append(spark, root, o.filter("o_orderkey < 500"))
    TL.log_rename_column(root, "o_orderkey", "order_key")
    changes = (
        o.filter("o_orderkey IN (1, 2)")
        .withColumnRenamed("o_orderkey", "order_key")
        .withColumn("o_orderstatus", F.lit("Z"))
    )
    TL.log_merge(spark, root, changes, "order_key")
    snap = TL.log_read(spark, root)
    assert (
        snap.filter("order_key IN (1, 2) AND o_orderstatus = 'Z'").count()
        == o.filter("o_orderkey IN (1, 2)").count()
    )
    # no duplicates introduced through the mapping
    assert snap.groupBy("order_key").count().filter("count > 1").count() == 0


# ---------------------------------------------------------------------------
# bloom file skipping
# ---------------------------------------------------------------------------

def test_bloom_point_lookup_prunes_scattered_files(spark, root):
    o = _orders(spark)
    # hash-scatter into 4 files per commit: min/max stats span the full
    # range everywhere, so only the bloom can prune
    for i in range(3):
        TL.log_append(
            spark, root,
            o.filter(F.col("o_orderkey") % 3 == i).repartition(
                4, "o_orderkey"
            ),
            stats_cols=["o_orderkey"],
            bloom_cols=["o_orderkey"],
        )
    state = TL._snapshot(root)
    n_live = len(state["live"])
    assert set(state["blooms"]) == set(state["live"])
    # a MID-RANGE existing key: every hash-scattered file's [min, max]
    # spans it, so range stats are provably useless and only the bloom
    # can prune
    keys = sorted(r[0] for r in o.select("o_orderkey").collect())
    key = int(keys[len(keys) // 2])

    lo_hi = state["stats"]
    spanning = [
        f for f, s in lo_hi.items()
        if s["o_orderkey"][0] <= key <= s["o_orderkey"][1]
    ]
    assert len(spanning) >= n_live - 2  # scattered layout: stats useless

    hit = TL.log_read(spark, root, point=("o_orderkey", key))
    assert len(hit.inputFiles()) < n_live  # the bloom pruned files
    assert hit.filter(F.col("o_orderkey") == key).count() == \
        o.filter(F.col("o_orderkey") == key).count() > 0

    # absent key: correct empty result; typically every file pruned
    miss = TL.log_read(spark, root, point=("o_orderkey", key + 987654))
    assert miss.filter(F.col("o_orderkey") == key + 987654).count() == 0

    # skipping is safe-only: pruned + real filter == unpruned + filter
    a = hit.filter(F.col("o_orderkey") == key).count()
    b = (TL.log_read(spark, root)
         .filter(F.col("o_orderkey") == key).count())
    assert a == b


def test_bloom_string_column_and_survival_through_cow(spark, root):
    docs = spark.read.parquet(
        os.path.join(SF, "documents.parquet")
    ).select("doc_id", "lang", "text")
    TL.log_append(spark, root, docs.repartition(4, "doc_id"),
                  bloom_cols=["doc_id", "lang"])
    # string bloom probes work and agree with the scan
    snap_all = TL.log_read(spark, root)
    one_lang = snap_all.select("lang").first()[0]
    hit = TL.log_read(spark, root, point=("lang", one_lang))
    assert hit.filter(F.col("lang") == one_lang).count() == \
        snap_all.filter(F.col("lang") == one_lang).count()
    # CoW delete refreshes blooms on rewritten files
    TL.log_delete_where(spark, root, "length(text) < 40")
    state = TL._snapshot(root)
    assert set(state["blooms"]) == set(state["live"])


def test_bloom_positions_driver_matches_executor(spark):
    """The driver-side probe arithmetic must reproduce the executor-side
    build positions bit-for-bit (long and string canonical forms)."""
    df = spark.createDataFrame(
        [(12345, "hello"), (-7, "wörld")], "k LONG, s STRING"
    )
    arr_k = TL._bloom_position_cols("k", is_string=False)
    arr_s = TL._bloom_position_cols("s", is_string=True)
    rows = df.select(
        "k", "s", arr_k.alias("pk"), arr_s.alias("ps")
    ).collect()
    for r in rows:
        assert sorted(r["pk"]) == sorted(
            TL._bloom_positions(spark, int(r["k"]))
        )
        assert sorted(r["ps"]) == sorted(
            TL._bloom_positions(spark, r["s"])
        )


# ---------------------------------------------------------------------------
# graded-entry smoke (full oracle parity runs in test_oracle_parity.py)
# ---------------------------------------------------------------------------

def test_new_registry_entries_run(spark):
    out = TL.tablelog_column_mapping(spark, SF)
    assert out.columns == ["o_orderkey", "total_price"]
    assert out.count() > 0
    out2 = TL.tablelog_checkpointed_read(spark, SF)
    assert out2.count() > 0
    out3 = TL.tablelog_bloom_point_lookup(spark, SF)
    assert out3.count() == 5


# ---------------------------------------------------------------------------
# in-place conversion (CONVERT TO DELTA shape)
# ---------------------------------------------------------------------------

def test_convert_in_place_zero_copy(spark, root):
    src_dir = os.path.join(root, "bare")
    o = _orders(spark)
    o.repartition(4).write.parquet(src_dir)
    table_root = os.path.join(root, "table")
    v = TL.log_convert_in_place(
        spark, table_root, src_dir,
        stats_cols=["o_orderkey"], bloom_cols=["o_orderkey"],
    )
    assert v == 0
    # zero-copy: linked files share inodes with the originals
    import glob
    srcs = {os.stat(f).st_ino for f in glob.glob(src_dir + "/*.parquet")}
    linked = {
        os.stat(os.path.join(table_root, f)).st_ino
        for f in TL._snapshot(table_root)["live"]
    }
    assert linked == srcs
    # content identical; the table is now fully log-governed
    assert sorted(TL.log_read(spark, table_root).collect()) == \
        sorted(o.collect())
    state = TL._snapshot(table_root)
    assert set(state["stats"]) == set(state["live"])
    assert set(state["blooms"]) == set(state["live"])
    TL.log_delete_where(spark, table_root, "o_orderstatus = 'F'")
    assert TL.log_read(spark, table_root).count() == \
        o.filter("o_orderstatus <> 'F'").count()
    # original files untouched by the CoW delete
    assert sorted(spark.read.parquet(src_dir).collect()) == \
        sorted(o.collect())
    # converting onto an existing table refuses
    with pytest.raises(ValueError, match="already exists"):
        TL.log_convert_in_place(spark, table_root, src_dir)


# ---------------------------------------------------------------------------
# incremental OPTIMIZE (small-file bin-packing)
# ---------------------------------------------------------------------------

def test_compact_small_files_carries_big_by_reference(spark, root):
    o = _orders(spark)
    # one big commit + five tiny per-"batch" commits (the streaming-sink
    # small-file shape)
    TL.log_append(spark, root, o.filter("o_orderkey < 1000"))
    for i in range(5):
        TL.log_append(
            spark, root,
            o.filter(f"o_orderkey >= {1000 + 80 * i} "
                     f"AND o_orderkey < {1000 + 80 * (i + 1)}"),
        )
    before = sorted(TL.log_read(spark, root).collect())
    big = set(TL._snapshot(root, 0)["live"])
    v = TL.log_compact_small_files(spark, root, small_max_rows=200,
                                   target_files=1)
    m = TL._read_manifest(root, v)
    state = TL._snapshot(root, v)
    # the big file was never rewritten; only small files packed
    assert big <= set(state["live"]) and not (big & set(m["remove"]))
    assert len(m["remove"]) == 5 and len(m["add"]) == 1
    assert len(state["live"]) == len(big) + 1
    # content-identical, and time travel still resolves the old layout
    assert sorted(TL.log_read(spark, root).collect()) == before
    assert TL.log_read(spark, root, version=3).count() == \
        o.filter("o_orderkey < 1240").count()
    # MoR vectors on small files materialize; on big files they ride
    TL.log_delete_where_mor(spark, root, "o_orderstatus = 'F'")
    n = TL.log_read(spark, root).count()
    v2 = TL.log_compact_small_files(spark, root, small_max_rows=500,
                                    target_files=1)
    assert TL.log_read(spark, root).count() == n
    # a second pass with nothing small enough is a no-op commit
    v3 = TL.log_compact_small_files(spark, root, small_max_rows=1)
    m3 = TL._read_manifest(root, v3)
    assert m3["add"] == [] and m3["remove"] == []
    assert TL.log_read(spark, root).count() == n


# ---------------------------------------------------------------------------
# ADVICE r7 fixes + checkpoint-bounded replay at depth
# ---------------------------------------------------------------------------

def test_fully_pruned_read_keeps_merged_schema(spark, root):
    """ADVICE r7: when prune/point skips every file, the empty result
    must carry the MERGED snapshot schema — a first-appended file that
    predates a later-added column must not narrow it."""
    o = _orders(spark)
    TL.log_append(
        spark, root, o.filter("o_orderkey < 100"), stats_cols=["o_orderkey"]
    )
    TL.log_append(
        spark,
        root,
        o.filter("o_orderkey >= 100 AND o_orderkey < 200").withColumn(
            "tag", F.lit("late")
        ),
        stats_cols=["o_orderkey"],
    )
    full = TL.log_read(spark, root)
    assert "tag" in full.columns
    empty = TL.log_read(spark, root, prune=("o_orderkey", -10, -5))
    assert empty.count() == 0
    assert set(empty.columns) == set(full.columns), empty.columns


def test_ddl_commits_write_cadence_checkpoint_once(spark, root, monkeypatch):
    """ADVICE r7: rename/drop rely on _commit's internal cadence
    checkpoint — no second explicit _maybe_checkpoint call (redundant
    snapshot re-resolution on every cadence-boundary DDL)."""
    calls = []
    orig = TL._maybe_checkpoint
    monkeypatch.setattr(
        TL,
        "_maybe_checkpoint",
        lambda r, v: calls.append(v) or orig(r, v),
    )
    o = _orders(spark)
    TL.log_append(spark, root, o.limit(5))
    TL.log_rename_column(root, "o_totalprice", "total_price")
    TL.log_drop_column(root, "o_orderstatus")
    # one cadence probe per commit (3 commits), not two for the DDLs
    assert calls == [0, 1, 2]
    got = TL.log_read(spark, root)
    assert got.columns == ["o_orderkey", "total_price"] or set(
        got.columns
    ) == {"o_orderkey", "total_price"}


def test_corrupt_checkpoint_after_vacuum_raises_clear_error(spark, root):
    """ADVICE r7: once VACUUM trims manifests below the retained floor,
    an unreadable checkpoint must fail snapshot resolution with a
    diagnosable error, not an unhandled FileNotFoundError mid-walk."""
    o = _orders(spark)
    for i in range(6):
        TL.log_append(spark, root, o.filter(F.col("o_orderkey") % 6 == i))
    TL.log_vacuum(root, retain_versions=2)
    assert TL._versions(root) == [4, 5]
    # corrupt every checkpoint (drop the files table inside each)
    for c in TL._checkpoint_versions(root):
        fp = os.path.join(TL._ckpt_dir(root, c), "files.parquet")
        if os.path.exists(fp):
            os.unlink(fp)
    with pytest.raises(ValueError, match="not resolvable"):
        TL._snapshot(root)


@pytest.mark.slow
def test_deep_log_replay_is_checkpoint_bounded(spark, root, monkeypatch):
    """VERDICT r7 #7: the delta-manifest claim at depth — 120 commits
    (12 cadence checkpoints), snapshot resolution reads at most
    CHECKPOINT_INTERVAL manifests past the covering checkpoint (replay
    I/O is O(interval), never O(history)), and VACUUM + RESTORE still
    round-trip on the deep log."""
    o = _orders(spark).limit(2)
    for _ in range(120):
        TL.log_append(spark, root, o)
    assert TL._latest_version(root) == 119
    ckpts = TL._checkpoint_versions(root)
    assert 110 in ckpts and len(ckpts) >= 11

    calls: list[int] = []
    orig = TL._read_manifest
    monkeypatch.setattr(
        TL,
        "_read_manifest",
        lambda r, v: calls.append(v) or orig(r, v),
    )
    state = TL._snapshot(root)
    assert len(state["live"]) >= 120
    assert len(calls) <= TL.CHECKPOINT_INTERVAL, calls
    assert calls and min(calls) > 110, calls
    monkeypatch.undo()

    # VACUUM to the last 15 versions, then RESTORE to a retained one
    n_before = TL.log_read(spark, root).count()
    TL.log_vacuum(root, retain_versions=15)
    assert TL._versions(root)[0] == 105
    assert TL.log_read(spark, root).count() == n_before
    TL.log_restore(spark, root, 110)
    assert TL.log_read(spark, root).count() == 111 * 2
    # post-restore the log is still resolvable at both ends
    assert TL.log_read(spark, root, version=119).count() == 120 * 2


# ---------------------------------------------------------------------------
# hidden partitioning (r8)
# ---------------------------------------------------------------------------

def _orders_dated(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )


def test_hidden_partitioning_prunes_only_matching_files(spark, root):
    """The read-audit contract: a quarter read over a month-partitioned
    table scans ONLY files whose partition value falls in the quarter —
    with NO stats in the manifest, so the skipping is attributable to
    partition pruning alone. The source column stays in file content
    (hidden layout), and pruning is safe-only (results exact)."""
    import datetime

    o = _orders_dated(spark)
    for i in range(2):
        TL.log_append(
            spark,
            root,
            o.filter(F.col("o_orderkey") % 2 == i).coalesce(1),
            partition_by=["month(o_orderdate)"],
        )
    st = TL._snapshot(root)
    assert st["stats"] == {}  # nothing for min/max skipping to do
    assert set(st["parts"]) == set(st["live"])  # every file carries a value
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    expected_files = [
        f
        for f in st["live"]
        if "1995-01" <= st["parts"][f]["month(o_orderdate)"] <= "1995-03"
    ]
    got = TL.log_read(spark, root, prune=("o_orderdate", lo, hi))
    scanned = [
        r[0]
        for r in got.select(F.input_file_name()).distinct().collect()
    ]
    assert len(scanned) == len(expected_files)
    assert all(any(s.endswith(e) for e in expected_files) for s in scanned)
    # safe-only: filtered result identical to the unpruned filter
    pred = (F.col("o_orderdate") >= F.lit(lo)) & (
        F.col("o_orderdate") <= F.lit(hi)
    )
    assert sorted(got.filter(pred).collect()) == sorted(
        TL.log_read(spark, root).filter(pred).collect()
    )
    # the layout is hidden: no derived column leaks into the schema
    assert all(not c.startswith("_tlp_") for c in got.columns)


def test_identity_and_bucket_point_pruning(spark, root):
    """identity(status) prunes point reads to one status's files;
    bucket(8, custkey) prunes a key probe to exactly one bucket — the
    probe hash is computed by the same Spark expression as the write
    side (bit-identity by construction)."""
    o = _orders_dated(spark)
    TL.log_append(
        spark,
        root,
        o.coalesce(1),
        partition_by=["identity(o_orderstatus)", "bucket(8, o_orderkey)"],
    )
    st = TL._snapshot(root)
    f_files = [
        f
        for f in st["live"]
        if st["parts"][f]["identity(o_orderstatus)"] == "F"
    ]
    got = TL.log_read(spark, root, point=("o_orderstatus", "F"))
    assert got.select(F.input_file_name()).distinct().count() == len(f_files)
    assert got.filter("o_orderstatus = 'F'").count() == o.filter(
        "o_orderstatus = 'F'"
    ).count()
    key = int(o.select("o_orderkey").first()[0])
    probe = TL.log_read(spark, root, point=("o_orderkey", key))
    buckets = {
        st["parts"][f]["bucket(8,o_orderkey)"]
        for f in st["live"]
        if any(
            probe_f.endswith(f)
            for probe_f in [
                r[0]
                for r in probe.select(F.input_file_name())
                .distinct()
                .collect()
            ]
        )
    }
    assert len(buckets) == 1
    assert probe.filter(F.col("o_orderkey") == key).count() == 1


def test_partition_metadata_survives_checkpoint_compact_restore(spark, root):
    """Partition values ride every state carrier: checkpoint round-trip
    preserves them bit-for-bit; compaction REWRITES files (new files
    carry no partition values — safe: they are simply never pruned) and
    content stays identical; RESTORE brings the partitioned layout (and
    its prunability) back."""
    import datetime

    o = _orders_dated(spark)
    TL.log_append(
        spark, root, o.coalesce(1), partition_by=["month(o_orderdate)"]
    )
    v_ckpt = TL.log_checkpoint(root)
    via_ckpt = TL._read_checkpoint(root, v_ckpt)
    assert via_ckpt is not None
    assert via_ckpt["parts"] == TL._snapshot(root)["parts"]

    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    pred = (F.col("o_orderdate") >= F.lit(lo)) & (
        F.col("o_orderdate") <= F.lit(hi)
    )
    n = TL.log_read(spark, root, prune=("o_orderdate", lo, hi)).filter(
        pred
    ).count()

    TL.log_compact(spark, root, target_files=1)
    st = TL._snapshot(root)
    assert st["parts"] == {}  # rewritten files: no partition metadata
    pruned = TL.log_read(spark, root, prune=("o_orderdate", lo, hi))
    assert pruned.filter(pred).count() == n  # kept everything — safe

    TL.log_restore(spark, root, 0)
    st2 = TL._snapshot(root)
    assert set(st2["parts"]) == set(st2["live"]) and st2["parts"] != {}
    assert TL.log_read(spark, root, prune=("o_orderdate", lo, hi)).filter(
        pred
    ).count() == n


def test_partition_pruning_registry_entry(spark):
    out = TL.tablelog_partition_pruning(spark, SF)
    import datetime

    o = _orders_dated(spark)
    exp = o.filter(
        (F.col("o_orderdate") >= F.lit(datetime.date(1995, 1, 1)))
        & (F.col("o_orderdate") <= F.lit(datetime.date(1995, 3, 31)))
    ).count()
    assert out.count() == exp


@pytest.mark.slow
def test_compact_small_preserves_partition_pruning(spark, root):
    """Incremental OPTIMIZE on a hidden-partitioned table bin-packs
    WITHIN each partition tuple and the packed outputs inherit their
    group's partition values — the compaction loop never forfeits
    pruning (Delta OPTIMIZE discipline). Cross-partition packing would
    show as a packed file with no/ambiguous partition value."""
    import datetime

    o = _orders_dated(spark)
    # the streaming-sink shape: several small appends, all partitioned
    for i in range(4):
        TL.log_append(
            spark,
            root,
            o.filter(F.col("o_orderkey") % 4 == i).coalesce(1),
            partition_by=["month(o_orderdate)"],
        )
    st0 = TL._snapshot(root)
    n_before = TL.log_read(spark, root).count()
    TL.log_compact_small_files(spark, root, small_max_rows=10**9)
    st1 = TL._snapshot(root)
    assert len(st1["live"]) < len(st0["live"])
    # every packed file carries its group's partition value
    assert set(st1["parts"]) == set(st1["live"])
    months0 = {v["month(o_orderdate)"] for v in st0["parts"].values()}
    months1 = {v["month(o_orderdate)"] for v in st1["parts"].values()}
    assert months1 == months0
    # content identical, and pruning still fires post-compaction
    assert TL.log_read(spark, root).count() == n_before
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    pruned = TL.log_read(spark, root, prune=("o_orderdate", lo, hi))
    scanned = pruned.select(F.input_file_name()).distinct().count()
    in_range = [
        f
        for f in st1["live"]
        if "1995-01" <= st1["parts"][f]["month(o_orderdate)"] <= "1995-03"
    ]
    assert scanned == len(in_range) < len(st1["live"])
    pred = (F.col("o_orderdate") >= F.lit(lo)) & (
        F.col("o_orderdate") <= F.lit(hi)
    )
    assert pruned.filter(pred).count() == o.filter(pred).count()


def test_bucket_transform_int_typed_column_probe_identity(spark, root):
    """Regression: Spark's xxhash64 hashes INT(7) and BIGINT(7)
    DIFFERENTLY, and the bucket probe binds Python ints as BIGINT — the
    write side must canonicalize integral columns through BIGINT or an
    int-typed key column buckets by one hash and probes by another,
    silently pruning files that DO contain the key (a wrong-results
    bug, not a missed optimization)."""
    rows = [(i, f"v{i}") for i in range(200)]
    # INT key, not LONG; one input partition -> exactly one file/bucket
    df = spark.createDataFrame(rows, "k INT, v STRING").coalesce(1)
    TL.log_append(spark, root, df, partition_by=["bucket(8, k)"])
    st = TL._snapshot(root)
    assert len(st["live"]) == 8
    for key in (0, 7, 63, 199):
        got = TL.log_read(spark, root, point=("k", key)).filter(
            F.col("k") == key
        )
        assert got.count() == 1, f"key {key} lost by bucket pruning"
    # and the probe keeps exactly one bucket's files
    probe = TL.log_read(spark, root, point=("k", 63))
    assert probe.select(F.input_file_name()).distinct().count() == 1


@pytest.mark.slow
def test_partition_scoped_zorder_compaction(spark, root):
    """Delta's partition-scoped OPTIMIZE ZORDER: incremental compaction
    with zorder_cols Morton-clusters each partition group into
    target_files files whose min/max stats become range-prunable, while
    the group's partition values are carried — a range probe prunes
    first by partition, then by the z-ordered stats."""
    import datetime

    o = _orders_dated(spark)
    for i in range(3):
        TL.log_append(
            spark,
            root,
            o.filter(F.col("o_orderkey") % 3 == i).coalesce(1),
            partition_by=["month(o_orderdate)"],
            stats_cols=["o_orderkey", "o_totalprice"],
        )
    n = TL.log_read(spark, root).count()
    TL.log_compact_small_files(
        spark,
        root,
        small_max_rows=10**9,
        target_files=2,
        zorder_cols=["o_orderkey", "o_totalprice"],
    )
    st = TL._snapshot(root)
    assert set(st["parts"]) == set(st["live"])  # values carried
    assert set(st["stats"]) == set(st["live"])  # fresh z-ordered stats
    assert TL.log_read(spark, root).count() == n  # content identical
    # z-ordered stats prune a key range WITHIN the partition-pruned set
    lo_k = int(o.agg(F.min("o_orderkey")).first()[0])
    pruned = TL.log_read(spark, root, prune=("o_orderkey", lo_k, lo_k))
    assert pruned.select(F.input_file_name()).distinct().count() < len(
        st["live"]
    )
    assert pruned.filter(F.col("o_orderkey") == lo_k).count() == o.filter(
        F.col("o_orderkey") == lo_k
    ).count()
    # and partition pruning still fires on the compacted layout
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    got = TL.log_read(spark, root, prune=("o_orderdate", lo, hi))
    in_range = [
        f
        for f in st["live"]
        if "1995-01" <= st["parts"][f]["month(o_orderdate)"] <= "1995-03"
    ]
    assert got.select(F.input_file_name()).distinct().count() == len(in_range)


# ---------------------------------------------------------------------------
# partition-aware copy-on-write probes (VERDICT r8 #3)
# ---------------------------------------------------------------------------

def test_predicate_conjunct_parser_is_safe_only():
    """The conjunct parser prunes only what it can PROVE is a plain
    top-level comparison: OR/NOT/parens abandon pruning entirely, a
    torn string literal abandons it (a fragment inside a literal could
    masquerade as a conjunct), <>/IS NULL conjuncts contribute nothing,
    and BETWEEN expands into the two bounds."""
    import datetime

    P = TL._predicate_conjuncts
    assert P("o_orderstatus = 'F'") == [("o_orderstatus", "=", "F")]
    assert P("a >= 5 AND b < 'x' and c = 1.5") == [
        ("a", ">=", 5), ("b", "<", "x"), ("c", "=", 1.5)
    ]
    assert P("d BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'") == [
        ("d", ">=", datetime.date(1996, 1, 1)),
        ("d", "<=", datetime.date(1996, 3, 31)),
    ]
    # escaped quote inside a literal
    assert P("name = 'it''s'") == [("name", "=", "it's")]
    # safe-only refusals
    assert P("a = 1 OR b = 2") == []
    assert P("NOT a = 1") == []
    assert P("month(d) = '1996-01'") == []
    assert P("a IN (1, 2)") == []
    # a string literal containing AND + a conjunct-looking substring
    # must not leak fake conjuncts
    assert P("note = 'p AND b = 5 AND q'") == []
    # unparseable conjunct skipped, parseable sibling kept
    assert P("a IS NULL AND b = 2") == [("b", "=", 2)]
    # <> parses but contributes no file-level pruning downstream
    assert P("a <> 1 AND b = 2") == [("a", "<>", 1), ("b", "=", 2)]


def test_cow_delete_probes_only_matching_partitions(spark, root):
    """A partition-scoped DELETE's probe candidate set is EXACTLY the
    matching partitions' files; the rewrite (manifest remove set) stays
    inside it and every other file is carried by reference — on a
    100 TB table the delete never scans untouched partitions."""
    o = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
        .filter("o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'")
    )
    TL.log_append(
        spark, root, o.coalesce(2), partition_by=["month(o_orderdate)"]
    )
    st = TL._snapshot(root)
    pred = (
        "o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31' "
        "AND o_orderstatus = 'O'"
    )
    want = {
        f
        for f in st["live"]
        if "1996-01" <= st["parts"][f]["month(o_orderdate)"] <= "1996-03"
    }
    cand = set(TL._cow_candidate_files(spark, st, pred))
    assert cand == want and cand and len(cand) < len(st["live"])
    before = set(st["live"])
    v = TL.log_delete_where(spark, root, pred)
    m = TL._read_manifest(root, v)
    assert set(m["remove"]) <= cand  # rewrites bound by the probe set
    # untouched partitions' files carried by reference, results exact
    assert before - cand <= set(TL._snapshot(root)["live"])
    got = TL.log_read(spark, root).count()
    assert got == o.filter(f"NOT ({pred})").count()


def test_mor_delete_probes_only_matching_partitions(spark, root):
    """The MoR delete's hit scan reads only candidate files: deletion
    vectors are written solely for matching-partition files."""
    o = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
        .filter("o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'")
    )
    TL.log_append(
        spark, root, o.coalesce(1), partition_by=["month(o_orderdate)"]
    )
    st = TL._snapshot(root)
    pred = "o_orderdate >= DATE '1997-06-01'"
    want = {
        f
        for f in st["live"]
        if st["parts"][f]["month(o_orderdate)"] >= "1997-06"
    }
    v = TL.log_delete_where_mor(spark, root, pred)
    m = TL._read_manifest(root, v)
    assert m["dv_set"] and set(m["dv_set"]) <= want
    assert TL.log_read(spark, root).count() == o.filter(
        f"NOT ({pred})"
    ).count()


def test_merge_probe_pruned_by_key_range_and_bucket(spark, root):
    """MERGE's affected-file probe shrinks through manifest metadata
    BEFORE any scan: on a bucket(8, key)-partitioned table a
    single-key change batch probes only that bucket's files (the
    session-free XXH64 matches the write hash), and the rewrite stays
    inside it."""
    o = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    TL.log_append(
        spark, root, o.coalesce(1), partition_by=["bucket(8, o_orderkey)"]
    )
    st = TL._snapshot(root)
    key = int(o.select("o_orderkey").first()[0])
    b = TL._bucket_of_py(key, 8)
    in_bucket = {
        f
        for f in st["live"]
        if st["parts"][f]["bucket(8,o_orderkey)"] == b
    }
    changes = o.filter(F.col("o_orderkey") == key).withColumn(
        "o_totalprice", F.lit(9999.0).cast("double")
    )
    v = TL.log_merge(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, v)
    assert m["remove"] and set(m["remove"]) <= in_bucket
    got = TL.log_read(spark, root)
    assert got.filter(F.col("o_orderkey") == key).first()[
        "o_totalprice"
    ] == 9999.0
    assert got.count() == o.count()


def test_cow_update_where_semantics(spark, root):
    """log_update_where: matching rows get the assignments (cast back
    to the pre-update column type), non-matching rows are byte-
    identical, deletion vectors are read through (dead rows neither
    resurrect nor update), the probe is partition-bounded, a no-match
    predicate commits a no-op delta, and an unknown SET target
    raises."""
    o = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
        .filter("o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'")
    )
    TL.log_append(
        spark, root, o.coalesce(2), partition_by=["month(o_orderdate)"]
    )
    # MoR-kill the F rows first: the update must not resurrect them
    TL.log_delete_where_mor(spark, root, "o_orderstatus = 'F'")
    pred = (
        "o_orderdate BETWEEN DATE '1996-04-01' AND DATE '1996-06-30' "
        "AND o_orderstatus = 'O'"
    )
    st = TL._snapshot(root)
    in_q2 = {
        f
        for f in st["live"]
        if "1996-04" <= st["parts"][f]["month(o_orderdate)"] <= "1996-06"
    }
    v = TL.log_update_where(
        spark, root, pred,
        {"o_orderstatus": "'U'", "o_totalprice": "o_totalprice + 1"},
    )
    m = TL._read_manifest(root, v)
    assert m["action"] == "update"
    assert set(m["remove"]) <= in_q2  # probe bounded by the partitions
    got = TL.log_read(spark, root)
    alive = o.filter("o_orderstatus <> 'F'")
    assert got.count() == alive.count()  # dead rows did not resurrect
    n_upd = alive.filter(pred).count()
    assert got.filter("o_orderstatus = 'U'").count() == n_upd > 0
    # ALL assignments apply against the PRE-update image simultaneously:
    # every re-statused row also carries the +1 surcharge (a sequential
    # withColumn chain would let the status flip hide rows from the
    # price assignment's predicate — regression, r9)
    want_prices = sorted(
        r[0] + 1 for r in alive.filter(pred).select("o_totalprice").collect()
    )
    got_prices = sorted(
        r[0]
        for r in got.filter("o_orderstatus = 'U'")
        .select("o_totalprice")
        .collect()
    )
    assert got_prices == want_prices
    # schema stable: totalprice stayed double
    assert dict(got.dtypes)["o_totalprice"] == "double"
    # untouched rows byte-identical
    assert sorted(
        got.filter(f"NOT ({pred.replace(chr(39)+'O'+chr(39), chr(39)+'O'+chr(39))})")
        .filter("o_orderstatus <> 'U'")
        .collect()
    ) == sorted(alive.filter(f"NOT ({pred})").collect())
    # no-match predicate: no-op delta, nothing rewritten
    v2 = TL.log_update_where(
        spark, root, "o_orderdate >= DATE '2099-01-01'",
        {"o_orderstatus": "'Z'"},
    )
    m2 = TL._read_manifest(root, v2)
    assert m2["add"] == [] and m2["remove"] == []
    with pytest.raises(ValueError, match="not a column"):
        TL.log_update_where(spark, root, pred, {"nope": "1"})


def test_cow_update_registry_entry_runs(spark):
    from cdc_local_data_pipeline_docker_spark.sources.tablelog import (
        tablelog_cow_update,
    )

    out = tablelog_cow_update(spark, SF)
    o = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    assert out.count() == o.count()
    assert out.filter("o_orderstatus = 'U'").count() > 0


# ---------------------------------------------------------------------------
# drop → re-add never reuses a live physical name (ADVICE r12 high)
# ---------------------------------------------------------------------------

def test_readd_dropped_column_does_not_resurface_old_data(spark, root):
    """Delta column mapping never reuses physical names: after DROP
    COLUMN, the dropped data stays in old files under its physical
    name — a column RE-ADDED with the same logical name must get a
    FRESH physical name, so pre-drop rows read NULL, never the dead
    values."""
    df = spark.createDataFrame(
        [(k, f"s{k}") for k in range(5)], "k LONG, tag STRING"
    )
    TL.log_append(spark, root, df)
    TL.log_rename_column(root, "k", "key")  # table enters mapping
    TL.log_drop_column(root, "tag")
    assert set(TL.log_read(spark, root).columns) == {"key"}
    # re-add `tag` via append: only the new rows carry values
    TL.log_append(
        spark, root,
        spark.createDataFrame([(100, "new")], "key LONG, tag STRING"),
    )
    state = TL._snapshot(root)
    # the re-added column must NOT map to the retired physical name
    assert state["colmap"]["tag"] != "tag"
    got = {r.key: r.tag for r in TL.log_read(spark, root).collect()}
    assert got[100] == "new"
    assert all(got[k] is None for k in range(5))  # dead data stays dead
    # time travel to the pre-drop era still shows the original values
    v0 = {r.key if hasattr(r, "key") else r.k
          for r in TL.log_read(spark, root, version=0).collect()}
    assert len(v0) == 5


def test_readd_dropped_column_via_merge_evolution(spark, root):
    """Same invariant through the MERGE schema-evolution writers (CoW
    and the SQL router): the evolved column gets a fresh physical
    name, untouched pre-drop rows read NULL."""
    df = spark.createDataFrame(
        [(k, k * 10) for k in range(4)], "k LONG, val LONG"
    )
    TL.log_append(spark, root, df)
    TL.log_rename_column(root, "val", "amount")
    TL.log_drop_column(root, "amount")
    ch = spark.createDataFrame(
        [(1, 999), (50, 5)], "k LONG, amount LONG"
    )
    TL.log_merge(spark, root, ch, "k")
    state = TL._snapshot(root)
    # the dead data lives under physical `val` — the re-added logical
    # column must not alias it
    assert state["colmap"]["amount"] != "val"
    got = {r.k: r.amount for r in TL.log_read(spark, root).collect()}
    assert got[1] == 999 and got[50] == 5
    assert got[2] is None and got[3] is None  # NOT 20 / 30


def test_reserved_physicals_cover_live_footers(spark, root):
    """The reserve-set invariant that makes the re-add fix safe: at
    every point — append, drop, compact (which carries dropped
    physical data through content-identically), evolved append — the
    manifest-derived reserve set COVERS the union of live files'
    footer column names, so _extend_colmap can never alias live
    data. Re-adding after a compact stays correct."""
    import pyarrow.parquet as pq

    def footers():
        st = TL._snapshot(root)
        names = set()
        for f in st["live"]:
            names.update(pq.read_schema(os.path.join(root, f)).names)
        return names - {TL._ROWID_COL}

    df = spark.createDataFrame(
        [(k, f"s{k}") for k in range(5)], "k LONG, tag STRING"
    )
    TL.log_append(spark, root, df)
    TL.log_rename_column(root, "k", "key")
    TL.log_drop_column(root, "tag")
    assert TL._reserved_physicals(TL._snapshot(root)) >= footers()
    TL.log_compact(spark, root, target_files=1)
    assert TL._reserved_physicals(TL._snapshot(root)) >= footers()
    TL.log_append(
        spark, root,
        spark.createDataFrame([(100, "new")], "key LONG, tag STRING"),
    )
    assert TL._reserved_physicals(TL._snapshot(root)) >= footers()
    got = {r.key: r.tag for r in TL.log_read(spark, root).collect()}
    assert got[100] == "new"
    assert all(got[k] is None for k in range(5))
