"""MERGE INTO and salted-skew-join operators (operators/merge.py)."""

import os

from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.operators import merge as M
from cdc_local_data_pipeline_docker_spark.operators.relational import DEC
from cdc_local_data_pipeline_docker_spark.catalog import load_table

from .oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_merge_into_clause_semantics(spark):
    """Tiny hand-built frame: each clause resolves exactly once."""
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", "update"),   # matched-update
            (3, None, "delete"),  # matched-delete
            (4, "d", "insert"),   # not-matched-insert
            (5, "E", "update"),   # unmatched update clause → no-op
        ],
        "k INT, v STRING, op STRING",
    )
    out = sorted(
        (r["k"], r["v"]) for r in M.merge_into(target, changes, "k").collect()
    )
    assert out == [(1, "a"), (2, "B"), (4, "d")]


def test_merge_into_orders_oracle(spark):
    con = duckdb_connection(SF_DIR)
    ok, msg = compare(M.merge_into_orders(spark, SF_DIR), con, M.MERGE_INTO_ORDERS_SQL)
    assert ok, msg


def test_merge_preserves_row_budget(spark):
    """|result| = |target| - |deletes| + |inserts| (updates are 1:1)."""
    o = load_table(spark, SF_DIR, "orders")
    n = o.count()
    n_del = o.filter(F.col("o_orderkey") % 10 == 7).count()
    n_ins = o.filter(F.col("o_orderkey") % 10 == 0).count()
    assert M.merge_into_orders(spark, SF_DIR).count() == n - n_del + n_ins


def test_salted_join_identical_to_plain(spark):
    """The salted formulation returns exactly the plain join's answer."""
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    plain = sorted(
        (r["o_orderstatus"], r["n_items"], r["revenue"])
        for r in li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    )
    salted = sorted(
        (r["o_orderstatus"], r["n_items"], r["revenue"])
        for r in M.join_salted_skew(spark, SF_DIR).collect()
    )
    assert salted == plain


def test_salted_join_oracle(spark):
    con = duckdb_connection(SF_DIR)
    ok, msg = compare(M.join_salted_skew(spark, SF_DIR), con, M.JOIN_SALTED_SKEW_SQL)
    assert ok, msg


def test_salted_join_plan_no_cartesian(spark):
    """The salt must join as an equi-key (BHJ/SMJ), never a cartesian or
    broadcast-nested-loop fallback."""
    plan = M.join_salted_skew(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_duplicate_change_keys_fan_out(spark):
    """Documents the PRECONDITION: duplicate change keys fan the matched
    row out (ANSI MERGE would error; a lazy plan cannot) — callers must
    collapse multi-event batches latest-wins first, as the CDC upsert
    does. This test pins the behavior so the contract stays visible."""
    target = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    changes = spark.createDataFrame(
        [(1, "X", "update"), (1, "Y", "update")], "k INT, v STRING, op STRING"
    )
    out = sorted((r["k"], r["v"]) for r in M.merge_into(target, changes, "k").collect())
    assert out == [(1, "X"), (1, "Y")]  # fan-out, not an error


def test_merge_lowshuffle_equivalence(spark):
    """The low-shuffle MERGE must produce the identical post-merge table
    to the full-outer form on the real change set."""
    a = M.merge_into_orders(spark, SF_DIR).collect()
    b = M.merge_into_orders_lowshuffle(spark, SF_DIR).collect()
    assert a == b and len(a) > 0


def test_merge_lowshuffle_plan_has_no_shuffle(spark):
    """The target must stream map-side: no SortMergeJoin and no
    hash-partitioned Exchange anywhere in the plan — only broadcast
    exchanges (the change-set subplan's 1-row max aggregate uses a
    SinglePartition exchange, and the presentation sort a range one;
    neither moves the target)."""
    plan = (
        M.merge_into_orders_lowshuffle(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_merge_lowshuffle_clause_semantics(spark):
    """Clause-level parity with merge_into on a hand fixture, including
    the matched-insert no-op and unmatched-update/delete no-ops."""
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    changes = spark.createDataFrame(
        [
            (1, "A", "update"),
            (2, None, "delete"),
            (3, "Z", "insert"),   # matched insert -> no-op
            (4, "d", "insert"),   # unmatched insert -> materializes
            (5, "E", "update"),   # unmatched update -> no-op
            (6, None, "delete"),  # unmatched delete -> no-op
        ],
        "k INT, v STRING, op STRING",
    )
    want = sorted(
        (r["k"], r["v"]) for r in M.merge_into(target, changes, "k").collect()
    )
    got = sorted(
        (r["k"], r["v"])
        for r in M.merge_into_lowshuffle(target, changes, "k").collect()
    )
    assert got == want == [(1, "A"), (3, "c"), (4, "d")]


def test_merge_on_bucketed_target_drops_target_exchange(spark, tmp_path):
    """The third MERGE regime (SCALE.md): with the target bucketed on
    the merge key, the full-outer join consumes the bucket layout — the
    TARGET side's Exchange disappears and only the (micro-batch-sized)
    change set shuffles. Result pinned identical to the plain-table
    merge."""
    from cdc_local_data_pipeline_docker_spark.catalog import load_table
    from cdc_local_data_pipeline_docker_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    o = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        o, "t_merge_bkt", str(tmp_path / "ob"), "o_orderkey", 8,
        sort_cols=("o_orderkey",),
    )
    try:
        ob = read_bucketed(spark, "t_merge_bkt").select(*o.columns)
        merged = M.merge_into(ob, M._orders_changes(ob), "o_orderkey")
        plan = merged._jdf.queryExecution().executedPlan().toString()
        join_ex = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        # exactly ONE join-side exchange: the change set (keyed __ck);
        # the bucketed target never shuffles
        assert len(join_ex) == 1, plan
        assert "__ck" in join_ex[0], join_ex
        assert plan.count("SortMergeJoin") == 1, plan

        want = sorted(
            map(tuple, M.merge_into(o, M._orders_changes(o), "o_orderkey").collect())
        )
        got = sorted(map(tuple, merged.collect()))
        assert got == want and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_merge_bkt")
