"""Round-10 merge-on-read WRITE paths (VERDICT r9 #2): UPDATE and
MERGE via deletion vectors + delta files — no pre-existing data file
is rewritten, the CDF emits exact pre/post images, and the result is
reader-indistinguishable from the copy-on-write twin."""

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
def root():
    d = tempfile.mkdtemp(prefix="tablelog_mor_write_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark, n=30):
    return (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select(*COLS)
        .limit(n)
    )


def _rows(spark, root, version=None):
    return {
        (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in TL.log_read(spark, root, version=version).collect()
    }


def test_mor_update_matches_cow_update(spark, root):
    """Same table, same UPDATE — MoR and CoW must produce identical
    snapshots, and MoR must carry every pre-existing file."""
    cow = tempfile.mkdtemp(prefix="tablelog_cow_twin_")
    try:
        orders = _orders(spark)
        for d in (root, cow):
            TL.log_append(spark, d, orders.coalesce(3))
        pred = "o_orderkey % 3 = 0"
        assignments = {"o_totalprice": "o_totalprice * 2"}
        TL.log_update_where_mor(spark, root, pred, assignments)
        TL.log_update_where(spark, cow, pred, assignments)
        assert _rows(spark, root) == _rows(spark, cow)
        # MoR carried every file; CoW rewrote the affected ones
        live0 = set(TL._snapshot(root, 0)["live"])
        st = TL._snapshot(root)
        assert live0 <= set(st["live"])
        assert st["dv"]
    finally:
        shutil.rmtree(cow, ignore_errors=True)


def test_mor_update_time_travel_and_cdf(spark, root):
    orders = _orders(spark)
    TL.log_append(spark, root, orders.coalesce(2))
    before = _rows(spark, root)
    TL.log_update_where_mor(
        spark, root, "o_orderstatus = 'O'", {"o_orderstatus": "'X'"}
    )
    assert _rows(spark, root, version=0) == before  # time travel
    n_open = len([r for r in before if r[1] == "O"])
    after = _rows(spark, root)
    assert len(after) == len(before)
    assert len([r for r in after if r[1] == "X"]) == n_open
    # CDF: pre-images = the old 'O' rows, post-images = the 'X' rows
    add, rem = TL.log_changes(spark, root, 1)
    assert rem.count() == n_open
    assert {r["o_orderstatus"] for r in rem.collect()} == {"O"}
    assert add.count() == n_open
    assert {r["o_orderstatus"] for r in add.collect()} == {"X"}


def test_mor_update_respects_prior_dv(spark, root):
    """A row killed by a prior MoR delete must not be updated back to
    life, and re-updates must union vectors, not lose positions."""
    orders = _orders(spark, 12)
    TL.log_append(spark, root, orders)
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    TL.log_delete_where_mor(spark, root, f"o_orderkey = {keys[0]}")
    TL.log_update_where_mor(
        spark, root, "o_totalprice > -1", {"o_orderstatus": "'Z'"}
    )
    out = TL.log_read(spark, root)
    assert out.count() == len(keys) - 1
    assert out.filter(f"o_orderkey = {keys[0]}").count() == 0
    assert out.filter("o_orderstatus != 'Z'").count() == 0


def test_mor_update_no_match_is_noop_commit(spark, root):
    orders = _orders(spark, 10)
    TL.log_append(spark, root, orders)
    TL.log_update_where_mor(
        spark, root, "o_orderkey = -42", {"o_orderstatus": "'Q'"}
    )
    assert TL._latest_version(root) == 1
    assert TL.log_read(spark, root).count() == 10


def test_mor_update_constraint_gate(spark, root):
    orders = _orders(spark, 10)
    TL.log_append(spark, root, orders)
    TL.log_add_constraint(spark, root, "price_pos", "o_totalprice > 0")
    with pytest.raises(TL.ConstraintViolation):
        TL.log_update_where_mor(
            spark, root, "o_orderkey % 2 = 0", {"o_totalprice": "-5.0"}
        )
    # nothing published
    assert TL.log_read(spark, root).filter("o_totalprice < 0").count() == 0


def test_mor_merge_matches_cow_merge(spark, root):
    cow = tempfile.mkdtemp(prefix="tablelog_cowmerge_twin_")
    try:
        orders = _orders(spark, 24)
        for d in (root, cow):
            TL.log_append(spark, d, orders.coalesce(3))
        keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
        changes = spark.createDataFrame(
            [(keys[0], "M", 111.0), (keys[1], "M", 222.0),
             (10_000_001, "N", 1.0), (10_000_002, "N", 2.0)],
            "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        )
        TL.log_merge_mor(spark, root, changes, "o_orderkey")
        TL.log_merge(spark, cow, changes, "o_orderkey")
        assert _rows(spark, root) == _rows(spark, cow)
        # MoR: every pre-existing file carried
        live0 = set(TL._snapshot(root, 0)["live"])
        assert live0 <= set(TL._snapshot(root)["live"])
    finally:
        shutil.rmtree(cow, ignore_errors=True)


def test_mor_merge_cdf_shape(spark, root):
    orders = _orders(spark, 12)
    TL.log_append(spark, root, orders)
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    changes = spark.createDataFrame(
        [(keys[0], "M", 9.0), (20_000_001, "N", 1.0)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    TL.log_merge_mor(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, 1)
    assert m["action"] == "merge_mor"
    add, rem = TL.log_changes(spark, root, 1)
    # removed = the matched key's old image; added = new image + insert
    assert rem.count() == 1
    assert rem.collect()[0]["o_orderkey"] == keys[0]
    got_add = {r["o_orderkey"] for r in add.collect()}
    assert got_add == {keys[0], 20_000_001}
    # net count delta == number of pure inserts
    assert TL.log_read(spark, root).count() == len(keys) + 1


def test_mor_merge_insert_only(spark, root):
    orders = _orders(spark, 8)
    TL.log_append(spark, root, orders)
    changes = spark.createDataFrame(
        [(30_000_001, "N", 1.0)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    TL.log_merge_mor(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, 1)
    assert not m.get("dv_set")
    assert TL.log_read(spark, root).count() == 9
    add, rem = TL.log_changes(spark, root, 1)
    assert rem is None or rem.count() == 0
    assert add.count() == 1


def test_mor_update_then_compact_materializes(spark, root):
    """OPTIMIZE after a MoR update drops the vectors and keeps content."""
    orders = _orders(spark, 20)
    TL.log_append(spark, root, orders.coalesce(2))
    TL.log_update_where_mor(
        spark, root, "o_orderkey % 2 = 0", {"o_orderstatus": "'E'"}
    )
    want = _rows(spark, root)
    TL.log_compact(spark, root, target_files=1)
    assert _rows(spark, root) == want
    assert not TL._snapshot(root)["dv"]


def test_mor_update_streaming_cdf_fold(spark, root):
    """The streaming CDF over an update_mor commit folds back to the
    snapshot (signed-multiset theorem extended to the new commit class)."""
    from cdc_local_data_pipeline_docker_spark.sources import (
        tablelog_source as TS,
    )

    orders = _orders(spark, 20)
    TL.log_append(spark, root, orders.coalesce(2))
    TL.log_update_where_mor(
        spark, root, "o_orderkey % 4 = 0", {"o_totalprice": "o_totalprice + 7"}
    )
    TL.log_delete_where_mor(spark, root, "o_orderkey % 5 = 0")
    TS.register(spark)
    cdf = (
        spark.read.format("tablelog")
        .option("path", root)
        .option("readChangeFeed", "true")
        .load()
    )
    folded = (
        cdf.groupBy(*COLS)
        .agg(
            F.sum(
                F.when(
                    F.col("_change_type").isin(
                        "insert", "update_postimage"
                    ),
                    1,
                ).otherwise(-1)
            ).alias("_net")
        )
        .filter("_net = 1")
        .select(*COLS)
    )
    got = {
        (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in folded.collect()
    }
    assert got == _rows(spark, root)


def test_rewrites_preserve_hidden_partitioning(spark, root):
    """r10: CoW UPDATE and MoR UPDATE rewrites re-derive the affected
    files' transform spec, so their replacement/delta files keep
    partition-pruning (before this, any rewrite dropped its files out
    of pruning forever — a slow decay to full scans at 100 TB)."""
    import datetime

    cols = ["o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"]
    orders = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select(*cols)
        .limit(400)
    )
    TL.log_append(
        spark, root, orders, partition_by=["month(o_orderdate)"]
    )
    # CoW update touching every file
    TL.log_update_where(
        spark, root, "o_totalprice > -1", {"o_orderstatus": "'R'"}
    )
    st = TL._snapshot(root)
    assert set(st["parts"]) == set(st["live"])  # rewritten files carry values
    # MoR update: the delta file also lands with partition values
    TL.log_update_where_mor(
        spark, root,
        "o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'",
        {"o_totalprice": "o_totalprice + 1"},
    )
    st = TL._snapshot(root)
    assert set(st["parts"]) == set(st["live"])
    lo, hi = datetime.date(1995, 1, 1), datetime.date(1995, 3, 31)
    pruned = TL.log_read(spark, root, prune=("o_orderdate", lo, hi))
    assert len(pruned.inputFiles()) < len(st["live"])
    # safe-only: pruned+filtered equals unpruned+filtered
    pred = (
        f"o_orderdate BETWEEN DATE '{lo}' AND DATE '{hi}'"
    )
    a = sorted(
        r["o_orderkey"] for r in pruned.filter(pred).collect()
    )
    b = sorted(
        r["o_orderkey"]
        for r in TL.log_read(spark, root).filter(pred).collect()
    )
    assert a == b and len(a) > 0


def test_mor_merge_probe_pruned_by_bucket(spark, root):
    """r10: the MoR merge shares the CoW probe — on a bucket(8, key)
    table a single-key change batch's DELETION VECTOR lands only in
    that bucket's files (the probe never scanned the others)."""
    o = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select(*COLS)
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
        "o_totalprice", F.lit(4242.0).cast("double")
    )
    v = TL.log_merge_mor(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, v)
    assert m["dv_set"] and set(m["dv_set"]) <= in_bucket
    assert not m["remove"]  # MoR: nothing rewritten
    got = TL.log_read(spark, root)
    assert got.filter(F.col("o_orderkey") == key).first()[
        "o_totalprice"
    ] == 4242.0
    assert got.count() == o.count()


def test_log_maintenance_policy(spark, root):
    """r10: the one-call maintenance policy runs exactly the operations
    the table's metadata says it needs — bin-pack for small-file
    accretion, purge for DV debt, checkpoint for resolution lag — and
    a healthy table is a no-op. All probes are footer/stat metadata."""
    orders = _orders(spark, 30)
    # accrete 10 tiny files + MoR-delete a third of the rows
    for k in range(10):
        TL.log_append(spark, root, orders.filter(f"o_orderkey % 10 = {k}"))
    TL.log_delete_where_mor(spark, root, "o_orderkey % 3 = 0")
    before = _rows(spark, root)
    plan = TL.log_maintenance(spark, root, small_file_trigger=5, dry_run=True)
    assert "compact_small" in plan["planned"]
    assert "purge" in plan["planned"]
    assert plan["ran"] == {} and TL._latest_version(root) == 10  # dry run
    report = TL.log_maintenance(spark, root, small_file_trigger=5)
    assert set(report["ran"]) >= {"compact_small", "purge"}
    # content identical; vectors materialized; small files packed
    assert _rows(spark, root) == before
    st = TL._snapshot(root)
    assert not st["dv"]
    assert len(st["live"]) < 10
    # a healthy table plans nothing destructive
    again = TL.log_maintenance(spark, root, small_file_trigger=5,
                               small_max_rows=1, dry_run=True)
    assert "compact_small" not in again["planned"]
    assert "purge" not in again["planned"]


def test_log_maintenance_checkpoint_lag_and_vacuum_gate(spark, root):
    orders = _orders(spark, 12)
    TL.log_append(spark, root, orders)
    for i in range(3):
        TL.log_update_where(
            spark, root, f"o_orderkey % 3 = {i}",
            {"o_orderstatus": f"'M{i}'"},
        )
    rep = TL.log_maintenance(spark, root, checkpoint_lag=2, dry_run=True)
    assert "checkpoint" in rep["planned"]
    assert rep["num_orphan_files"] == 0
    ran = TL.log_maintenance(spark, root, checkpoint_lag=2)
    assert "checkpoint" in ran["ran"]
    # vacuum never trims history implicitly: without retain_versions it
    # only collects orphans (none here), and history stays intact
    assert len(TL._versions(root)) >= 4


def test_history_metrics_and_restore_timestamp(spark, root):
    """r10: DESCRIBE HISTORY with operationMetrics (footer-resolved
    rows written/changed per commit) and RESTORE ... TIMESTAMP AS OF."""
    import json as _json

    orders = _orders(spark, 20)
    TL.log_append(spark, root, orders)              # v0: 20 rows
    TL.log_update_where(                            # v1: CoW update
        spark, root, "o_orderkey % 2 = 0", {"o_orderstatus": "'H'"}
    )
    TL.log_delete_where_mor(spark, root, "o_orderkey % 5 = 0")  # v2
    hist = TL.log_history(root, include_metrics=True)
    assert hist[0]["rows_written"] == 20
    n_upd = orders.filter("o_orderkey % 2 = 0").count()
    assert hist[1]["rows_changed"] == n_upd          # exact pre-images
    assert hist[1]["rows_inserted"] == 0
    assert hist[2]["rows_deleted_by_vector"] > 0
    # restore by timestamp: pin v0's ts, restore to it
    p = os.path.join(root, TL._LOG_DIR, TL._manifest_name(0))
    m = _json.load(open(p))
    TL.log_restore_timestamp(spark, root, float(m["ts"]))
    assert _rows(spark, root) == {
        (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in TL.log_read(spark, root, version=0).collect()
    }


def test_row_ids_stable_across_mor_history(spark, root):
    """r10 row tracking (Delta base-row-ID semantics): ids are unique,
    and a surviving row keeps ITS id across appends, MoR delete, and
    MoR update; a CoW rewrite reassigns (documented contract)."""
    orders = _orders(spark, 20)
    TL.log_append(spark, root, orders.coalesce(2))
    ids0 = {
        r["o_orderkey"]: r["_row_id"]
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    assert len(set(ids0.values())) == len(ids0)  # unique
    TL.log_append(spark, root, orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    ))
    TL.log_delete_where_mor(spark, root, "o_orderkey % 4 = 1")
    TL.log_update_where_mor(
        spark, root,
        "o_orderkey % 4 = 2 and o_orderkey < 10000000",
        {"o_orderstatus": "'W'"},
    )
    cur = {
        r["o_orderkey"]: r["_row_id"]
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    assert len(set(cur.values())) == len(cur)
    # untouched original rows keep their ids through all four commits
    for k, i in ids0.items():
        if k % 4 in (1, 2):  # deleted or moved-to-delta-file rows
            continue
        assert cur[k] == i, f"key {k} id drifted"
    # MoR-updated rows live in the delta file: NEW ids, disjoint
    moved = [k for k in ids0 if k % 4 == 2]
    for k in moved:
        assert cur[k] != ids0[k]
    # historical read: ids at v0 match what they were
    v0 = {
        r["o_orderkey"]: r["_row_id"]
        for r in TL.log_read_with_row_ids(spark, root, version=0).collect()
    }
    assert v0 == ids0
    # r11: bases are recorded at commit time, so ids SURVIVE a
    # retention trim (the r10 replay-only form refused here); the
    # legacy-prefix refusal is pinned in test_tablelog_row_lineage
    TL.log_vacuum(root, retain_versions=2)
    assert TL._versions(root)[0] > 0
    assert {
        r["o_orderkey"]: r["_row_id"]
        for r in TL.log_read_with_row_ids(spark, root).collect()
    } == cur


def test_mor_positions_aggregated_per_file_before_collect(spark, root, monkeypatch):
    """VERDICT r10 #2: the MoR writers must never collect one row per
    matched POSITION — positions are grouped per affected file
    executor-side, so the driver receives O(files) rows, not O(rows),
    and maps each path by one dict probe instead of an
    O(positions × candidates) endswith scan. The spy asserts (a) no
    collect ships a per-position (_fpn, _ri) frame and (b) every
    grouped (_fpn, _ris) collect returns at most the affected file
    count."""
    orders = _orders(spark, n=60)
    TL.log_append(spark, root, orders.coalesce(3))  # 3 files

    # patch the CONCRETE class: pyspark.sql.DataFrame is an abstract
    # base in Spark 4 and classic DataFrame overrides collect
    from pyspark.sql.classic.dataframe import DataFrame

    orig = DataFrame.collect
    calls: list[tuple[tuple[str, ...], int]] = []

    def spy(self):
        rows = orig(self)
        calls.append((tuple(self.columns), len(rows)))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    # wide predicates: every row of every file matches
    TL.log_update_where_mor(
        spark, root, "o_orderkey >= 0", {"o_totalprice": "o_totalprice + 1"}
    )
    TL.log_delete_where_mor(spark, root, "o_totalprice > -1")
    TL.log_append(spark, root, orders.limit(20).coalesce(1))
    TL.log_merge_mor(
        spark,
        root,
        orders.limit(10).withColumn("o_totalprice", F.lit(0.0)),
        "o_orderkey",
    )
    per_position = [c for c in calls if set(c[0]) == {"_fpn", "_ri"}]
    assert per_position == [], f"per-position collect shipped: {per_position}"
    grouped = [c for c in calls if set(c[0]) == {"_fpn", "_ris"}]
    assert grouped, "expected grouped per-file position collects"
    assert all(n <= 4 for _cols, n in grouped), grouped


def test_maintenance_never_deletes_orphans_implicitly(spark, root):
    """ADVICE r10 (medium): orphan deletion is an exclusive-window
    operation (a concurrent writer's in-flight files look like
    orphans) — the policy reports the count but only deletes on an
    explicit opt-in (delete_orphans=True or a retention trim)."""
    TL.log_append(spark, root, _orders(spark, 10))
    # simulate a concurrent writer's in-flight (uncommitted) file
    stray_dir = os.path.join(root, TL._DATA_DIR, "inflight0000")
    os.makedirs(stray_dir)
    src = os.path.join(
        root, TL._snapshot(root)["live"][0]
    )
    stray = os.path.join(stray_dir, "part-00000.parquet")
    shutil.copyfile(src, stray)
    rep = TL.log_maintenance(spark, root)
    assert rep["num_orphan_files"] == 1
    assert "vacuum" not in rep["planned"]
    assert os.path.exists(stray), "default run must not delete orphans"
    ran = TL.log_maintenance(spark, root, delete_orphans=True)
    assert "vacuum" in ran["ran"]
    assert not os.path.exists(stray)


def test_history_dv_metric_counts_only_new_deletes(spark, root):
    """ADVICE r10: vectors are cumulative per-file unions — a second
    MoR delete on the same file must report only ITS newly-dead rows,
    not re-count the first delete's."""
    TL.log_append(spark, root, _orders(spark, 30).coalesce(1))
    TL.log_delete_where_mor(spark, root, "o_orderkey % 3 = 0")   # v1
    TL.log_delete_where_mor(spark, root, "o_orderkey % 3 = 1")   # v2
    n0 = _orders(spark, 30).filter("o_orderkey % 3 = 0").count()
    n1 = _orders(spark, 30).filter("o_orderkey % 3 = 1").count()
    hist = TL.log_history(root, include_metrics=True)
    assert hist[1]["rows_deleted_by_vector"] == n0
    assert hist[2]["rows_deleted_by_vector"] == n1


def test_merge_constraint_violation_validates_written_and_cleans_up(
    spark, root
):
    """ADVICE r10 (low): MERGE (CoW and MoR) validates the WRITTEN
    files — the materialized input — and a violation publishes nothing
    and leaves no token tree behind."""
    TL.log_append(spark, root, _orders(spark, 20))
    TL.log_add_constraint(spark, root, "price_pos", "o_totalprice >= 0")
    before = _rows(spark, root)
    v_before = TL._latest_version(root)
    bad = _orders(spark, 5).withColumn("o_totalprice", F.lit(-1.0))
    for op in (TL.log_merge, TL.log_merge_mor):
        with pytest.raises(TL.ConstraintViolation):
            op(spark, root, bad, "o_orderkey")
        assert TL._latest_version(root) == v_before
        assert _rows(spark, root) == before
    # no orphaned token trees: every data/<token> dir is referenced
    data_dir = os.path.join(root, TL._DATA_DIR)
    live_tokens = {
        f.split("/")[1] for f in TL._snapshot(root)["live"]
    }
    on_disk = set(os.listdir(data_dir))
    assert on_disk <= live_tokens | {
        t for t in on_disk if os.listdir(os.path.join(data_dir, t))
    } and all(
        os.listdir(os.path.join(data_dir, t)) for t in on_disk
    ), "rejected write left an empty token dir"


def test_partitioned_append_violation_removes_whole_token_tree(
    spark, root
):
    """ADVICE r10 (low): a rejected hidden-partitioned append spans
    partition subdirectories — cleanup must remove the whole
    data/<token> tree, not just one leaf dir."""
    TL.log_append(
        spark, root, _orders(spark, 20),
        partition_by=["bucket(4, o_orderkey)"],
    )
    TL.log_add_constraint(spark, root, "price_pos", "o_totalprice >= 0")
    tokens_before = set(os.listdir(os.path.join(root, TL._DATA_DIR)))
    bad = _orders(spark, 8).withColumn("o_totalprice", F.lit(-5.0))
    with pytest.raises(TL.ConstraintViolation):
        TL.log_append(
            spark, root, bad, partition_by=["bucket(4, o_orderkey)"]
        )
    assert set(os.listdir(os.path.join(root, TL._DATA_DIR))) == (
        tokens_before
    ), "rejected partitioned append left its token tree behind"


def test_wide_predicate_mor_degrades_to_cow(spark, root):
    """VERDICT r11 #2: a MoR op matching more rows than the budget must
    fall back to the CoW writer (positions never ship driver-side) with
    IDENTICAL results; a narrow op under the same budget stays MoR."""
    orders = _orders(spark)
    TL.log_append(spark, root, orders.coalesce(3))
    # wide delete: every matched row, budget 5 -> CoW action, no DVs
    TL.log_delete_where_mor(
        spark, root, "o_orderkey % 2 = 0", max_matched_rows=5
    )
    m1 = TL._read_manifest(root, 1)
    assert m1["action"] == "delete" and not TL._snapshot(root)["dv"]
    want = {k for k, _s, _p in _rows(spark, root, version=0)
            if k % 2 != 0}
    assert {k for k, _s, _p in _rows(spark, root)} == want
    # narrow delete under the budget stays MoR
    TL.log_delete_where_mor(
        spark, root, "o_orderkey % 7 = 1", max_matched_rows=5
    )
    assert TL._read_manifest(root, 2)["action"] == "delete_mor"
    # wide UPDATE degrades too, same all-at-once assignment semantics
    TL.log_update_where_mor(
        spark, root, "o_totalprice > 0",
        {"o_totalprice": "o_totalprice + 1"}, max_matched_rows=5,
    )
    assert TL._read_manifest(root, 3)["action"] == "update"
    # wide MERGE degrades to the CoW merge
    wide = TL.log_read(spark, root).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10
    )
    TL.log_merge_mor(spark, root, wide, "o_orderkey", max_matched_rows=5)
    m4 = TL._read_manifest(root, 4)
    assert m4["action"] == "merge" and not m4.get("dv_set")
    # the MERGE result is the +10 image of version 3
    v3 = {(k, s, p) for k, s, p in _rows(spark, root, version=3)}
    assert _rows(spark, root) == {(k, s, round(p + 10, 2))
                                  for k, s, p in v3}


# ---------------------------------------------------------------------------
# distributed DV writes: positions never reach the driver (VERDICT r12 #4)
# ---------------------------------------------------------------------------

@pytest.fixture()
def _spy_no_driver_positions(monkeypatch):
    """Fail the test if the driver-side position path runs."""
    def _boom(*a, **k):
        raise AssertionError(
            "driver-side _positions_by_file ran on a wide MoR batch"
        )

    monkeypatch.setattr(TL, "_positions_by_file", _boom)
    # shrink the cutoff so sf0.001-sized fixtures exercise the wide path
    monkeypatch.setattr(TL, "MOR_DRIVER_POSITIONS_MAX", 10)


def _wide_table(spark, root, n=4000):
    TL.log_append(
        spark,
        root,
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.5).alias("x"),
        )
        .repartition(4),
    )
    return n


def test_mor_delete_wide_batch_never_ships_positions(
    spark, root, _spy_no_driver_positions
):
    n = _wide_table(spark, root)
    v = TL.log_delete_where_mor(spark, root, "k % 2 = 0")
    m = TL._read_manifest(root, v)
    assert m["action"] == "delete_mor" and m["dv_set"]
    got = TL.log_read(spark, root)
    assert got.count() == n // 2
    assert got.filter("k % 2 = 0").count() == 0
    # re-delete unions with the existing vectors, still executor-side
    TL.log_delete_where_mor(spark, root, "k % 3 = 0")
    assert TL.log_read(spark, root).filter("k % 3 = 0").count() == 0
    assert TL.log_read(spark, root).count() == n - n // 2 - len(
        [k for k in range(n) if k % 2 and k % 3 == 0]
    )


def test_mor_update_wide_batch_never_ships_positions(
    spark, root, _spy_no_driver_positions
):
    n = _wide_table(spark, root)
    v = TL.log_update_where_mor(
        spark, root, "k % 2 = 0", {"x": "x + 100"}
    )
    m = TL._read_manifest(root, v)
    assert m["action"] == "update_mor" and m["dv_set"] and m["live_add"]
    got = {r.k: r.x for r in TL.log_read(spark, root).collect()}
    assert len(got) == n
    assert got[0] == 100.0 and got[2] == 103.0 and got[1] == 1.5


def test_mor_merge_wide_batch_never_ships_positions(
    spark, root, _spy_no_driver_positions
):
    n = _wide_table(spark, root)
    changes = spark.range(0, n, 2).select(
        F.col("id").alias("k"),
        F.lit(99).cast("long").alias("g"),
        F.lit(-1.0).alias("x"),
    )
    v = TL.log_merge_mor(spark, root, changes, "k")
    m = TL._read_manifest(root, v)
    assert m["action"] == "merge_mor" and m["dv_set"]
    got = {r.k: (r.g, r.x) for r in TL.log_read(spark, root).collect()}
    assert len(got) == n
    assert got[0] == (99, -1.0) and got[1] == (1 % 7, 1.5)


def test_mor_small_batch_still_uses_driver_writer(spark, root, monkeypatch):
    """Below the cutoff the zero-extra-stage pyarrow path still runs —
    the hybrid keeps point deletes cheap."""
    calls = []
    orig = TL._write_deletion_vectors

    def _spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(TL, "_write_deletion_vectors", _spy)
    _wide_table(spark, root, n=100)
    TL.log_delete_where_mor(spark, root, "k < 10")
    assert calls and TL.log_read(spark, root).count() == 90
