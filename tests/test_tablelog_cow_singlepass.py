"""Single-pass tagged copy-on-write commits (r13 optimization): the
UPDATE/DELETE fast path writes survivors AND the commit-time change
images in ONE Spark job (`_write_cow_tagged`), partitioned by a tag
column and promoted to the layout the readers/manifests always used.
These tests pin the edges the optimization's semantic-compat argument
rests on — a drifted fast path would silently diverge from the
multi-write form, not crash."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_sp_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_tagged_layout_matches_readers_and_manifest(spark, root):
    """The promoted layout is indistinguishable from the multi-write
    form: live files directly under data/<token>/, change images under
    _cdf_pre/_cdf_post, manifest lists pointing at exactly those paths,
    and no tag directory (or tag column) surviving anywhere."""
    o = _orders(spark)
    TL.log_append(spark, root, o)
    TL.log_update_where(
        spark, root, "o_orderstatus = 'O'", {"o_totalprice": "o_totalprice + 5"}
    )
    m = TL._read_manifest(root, 1)
    assert m["live_add"] and m["cdf_pre"] and m["cdf_post"]
    for f in m["live_add"]:
        # directly under the token dir: data/<token>/<file>
        assert os.path.basename(os.path.dirname(os.path.dirname(f))) == "data"
        assert os.path.exists(os.path.join(root, f))
    for f in m["cdf_pre"]:
        assert os.path.dirname(f).endswith("_cdf_pre")
        assert os.path.exists(os.path.join(root, f))
    for f in m["cdf_post"]:
        assert os.path.dirname(f).endswith("_cdf_post")
    # no leftover partitionBy tag dirs, and no tag column in any file
    for dirpath, dirs, _files in os.walk(os.path.join(root, "data")):
        assert not any(TL._COW_TAG in d for d in dirs), (dirpath, dirs)
    snap = TL.log_read(spark, root)
    assert TL._COW_TAG not in snap.columns
    # content equals the projection the multi-write form produced
    expected = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") + 5
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    assert snap.exceptAll(expected).count() == 0
    assert expected.exceptAll(snap).count() == 0


def test_update_cdf_images_exact(spark, root):
    """The single-pass pre/post sidecars carry EXACTLY the matched rows'
    old and new images (the change-feed contract the 3-write form
    served)."""
    o = _orders(spark)
    TL.log_append(spark, root, o)
    TL.log_update_where(
        spark, root, "o_orderkey % 7 = 0", {"o_orderstatus": "'Z'"}
    )
    m = TL._read_manifest(root, 1)
    pre = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_pre"]])
    post = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_post"]])
    matched = o.filter("o_orderkey % 7 = 0")
    assert pre.count() == matched.count() == post.count()
    assert pre.exceptAll(matched).count() == 0
    assert post.filter("o_orderstatus <> 'Z'").count() == 0
    # post keys == pre keys
    assert (
        post.select("o_orderkey").exceptAll(pre.select("o_orderkey")).count()
        == 0
    )


def test_delete_all_rows_leaves_readable_empty_table(spark, root):
    """A DELETE matching every row goes through the fast path with an
    empty 'live' tag — no survivor files, empty-but-readable snapshot,
    pre-image sidecar carrying the full table."""
    o = _orders(spark)
    TL.log_append(spark, root, o)
    TL.log_delete_where(spark, root, "o_orderkey IS NOT NULL")
    m = TL._read_manifest(root, 1)
    assert m["live_add"] == []
    assert m["cdf_pre"]
    snap = TL.log_read(spark, root)
    assert snap.count() == 0
    assert set(snap.columns) == set(o.columns)
    # pre-image = the whole table
    pre = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_pre"]])
    assert pre.count() == o.count()


def test_null_predicate_rows_keep_multiwrite_semantics(spark, root):
    """Rows where the DELETE predicate evaluates NULL fell out of BOTH
    filters in the multi-write form (survivors used `~pred`, the
    sidecar used `pred`; NULL fails both) — the fast path's explode of
    a NULL array must reproduce that exactly, and UPDATE's NULL-match
    rows must pass through unmodified with no change image."""
    o = _orders(spark).limit(100)
    with_null = o.withColumn(
        "flag",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("o_orderkey") % 3 == 1),
    )
    TL.log_append(spark, root, with_null)
    n_null = with_null.filter("flag IS NULL").count()
    n_true = with_null.filter("flag = true").count()
    n_false = with_null.filter("flag = false").count()
    assert n_null and n_true and n_false
    TL.log_delete_where(spark, root, "flag")
    snap = TL.log_read(spark, root)
    # NULL-flag rows are dropped from survivors AND absent from the
    # pre-image (the historical two-filter behavior)
    assert snap.count() == n_false
    m = TL._read_manifest(root, 1)
    pre = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_pre"]])
    assert pre.count() == n_true
    # UPDATE on a fresh table: NULL-match rows pass through unmodified
    # (kept in the rewrite, no change image for them)
    root2 = tempfile.mkdtemp(prefix="tablelog_sp_upd_")
    try:
        TL.log_append(spark, root2, with_null)
        TL.log_update_where(spark, root2, "flag", {"o_totalprice": "0.0"})
        m2 = TL._read_manifest(root2, 1)
        pre2 = spark.read.parquet(
            *[os.path.join(root2, f) for f in m2["cdf_pre"]]
        )
        assert pre2.count() == n_true  # only true-match rows imaged
        snap2 = TL.log_read(spark, root2)
        assert snap2.count() == with_null.count()  # nothing dropped
        assert snap2.filter("o_totalprice = 0.0").count() == n_true
        assert (
            snap2.filter("flag IS NULL AND o_totalprice = 0.0").count() == 0
        )
    finally:
        shutil.rmtree(root2, ignore_errors=True)


def test_fast_path_gates_fall_back_to_multiwrite(spark, root):
    """Stats-carrying tables take the multi-write path (stats must be
    recomputed for survivor files) — and still produce correct content
    plus refreshed stats for the rewritten files."""
    o = _orders(spark)
    TL.log_append(spark, root, o.coalesce(2), stats_cols=["o_orderkey"])
    TL.log_update_where(
        spark, root, "o_orderkey % 2 = 0", {"o_totalprice": "o_totalprice + 1"}
    )
    m = TL._read_manifest(root, 1)
    # survivors re-carry min/max stats (the multi-write path's job)
    assert m["stats_add"]
    assert all("o_orderkey" in s for s in m["stats_add"].values())
    expected = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    snap = TL.log_read(spark, root)
    assert snap.exceptAll(expected).count() == 0
    assert expected.exceptAll(snap).count() == 0


# ---------------------------------------------------------------------------
# r14: MERGE single-pass tagged commit + DV-aware probe, MoR update
# delta+preimage single write
# ---------------------------------------------------------------------------


def test_merge_singlepass_images_and_content_exact(spark, root):
    """The single-pass MERGE commit writes survivors + pre/post/ins from
    one tagged job; images must be EXACTLY the multi-write form's: pre =
    matched old rows, post = matched change rows, ins = pure inserts,
    final content = upsert semantics, no tag dirs/columns anywhere."""
    o = _orders(spark).limit(200)
    TL.log_append(spark, root, o)
    changes = o.filter("o_orderkey % 5 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") + 100
    ).unionByName(
        o.select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
        ).limit(7)
    )
    n_upd = o.filter("o_orderkey % 5 = 0").count()
    TL.log_merge(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, 1)
    assert m["cdf_pre"] and m["cdf_post"] and m["cdf_ins"]
    pre = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_pre"]])
    post = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_post"]])
    ins = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_ins"]])
    assert pre.count() == post.count() == n_upd
    assert ins.count() == 7
    assert pre.exceptAll(o.filter("o_orderkey % 5 = 0")).count() == 0
    assert post.filter(~(F.col("o_orderkey") % 5 == 0)).count() == 0
    assert ins.filter(F.col("o_orderkey") < 10_000_000).count() == 0
    # final content = upsert(o, changes)
    expected = o.filter("o_orderkey % 5 <> 0").unionByName(changes)
    snap = TL.log_read(spark, root)
    assert TL._COW_TAG not in snap.columns
    assert snap.exceptAll(expected).count() == 0
    assert expected.exceptAll(snap).count() == 0
    for dirpath, dirs, _files in os.walk(os.path.join(root, "data")):
        assert not any(TL._COW_TAG in d for d in dirs), (dirpath, dirs)


def test_merge_dv_dead_key_is_an_insert(spark, root):
    """DV-aware probe (r14): a change key whose only target occurrences
    are deletion-vector-dead is a pure INSERT — classified 'ins', its
    file is NOT rewritten (carried by reference, vector intact), and
    the dead row stays dead."""
    o = _orders(spark).limit(100)
    TL.log_append(spark, root, o)
    k = o.select("o_orderkey").first()[0]
    TL.log_delete_where_mor(spark, root, f"o_orderkey = {k}")
    changes = o.filter(F.col("o_orderkey") == k).withColumn(
        "o_orderstatus", F.lit("R")
    )
    TL.log_merge(spark, root, changes, "o_orderkey")
    m = TL._read_manifest(root, TL._latest_version(root))
    assert m["remove"] == []  # nothing rewritten
    assert m["cdf_pre"] == [] and m["cdf_post"] == []
    assert m["cdf_ins"]
    snap = TL.log_read(spark, root)
    hit = snap.filter(F.col("o_orderkey") == k).collect()
    assert len(hit) == 1 and hit[0]["o_orderstatus"] == "R"
    assert snap.count() == o.count()  # 100 - 1 dead + 1 insert


def test_mor_update_singlepass_delta_and_preimage(spark, root):
    """MoR UPDATE on an unpartitioned/stat-less table writes the delta
    file (post-images, doubling as cdf_post) and the pre-image sidecar
    in ONE tagged job — images and final content identical to the
    2-write form; vectors still mark the old positions dead."""
    o = _orders(spark).limit(300)
    TL.log_append(spark, root, o)
    TL.log_update_where_mor(
        spark, root, "o_orderkey % 4 = 0", {"o_totalprice": "o_totalprice * 2"}
    )
    m = TL._read_manifest(root, 1)
    n_upd = o.filter("o_orderkey % 4 = 0").count()
    assert m["dv_set"] and m["live_add"] and m["cdf_pre"]
    assert m["cdf_post"] == m["live_add"]  # delta files ARE post-images
    pre = spark.read.parquet(*[os.path.join(root, f) for f in m["cdf_pre"]])
    delta = spark.read.parquet(
        *[os.path.join(root, f) for f in m["live_add"]]
    )
    assert pre.count() == delta.count() == n_upd
    assert pre.exceptAll(o.filter("o_orderkey % 4 = 0")).count() == 0
    expected = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 4 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    snap = TL.log_read(spark, root)
    assert snap.exceptAll(expected).count() == 0
    assert expected.exceptAll(snap).count() == 0
    for dirpath, dirs, _files in os.walk(os.path.join(root, "data")):
        assert not any(TL._COW_TAG in d for d in dirs), (dirpath, dirs)


def test_cow_tag_named_column_falls_back(spark, root):
    """A physical column literally named `_tl_cdf_tag` must push every
    CoW writer onto the multi-write path and still commit correctly
    (ADVICE r13: the tagged struct would carry duplicate field names)."""
    o = _orders(spark).limit(50).withColumn(TL._COW_TAG, F.lit("x"))
    TL.log_append(spark, root, o)
    TL.log_update_where(
        spark, root, "o_orderkey % 2 = 0", {"o_totalprice": "o_totalprice + 1"}
    )
    TL.log_merge(
        spark,
        root,
        o.limit(5).withColumn("o_totalprice", F.lit(0.0)),
        "o_orderkey",
    )
    TL.log_delete_where(spark, root, "o_orderkey % 3 = 0")
    snap = TL.log_read(spark, root)
    assert TL._COW_TAG in snap.columns  # the USER column survives
    assert snap.count() > 0
