"""Property tests for approximate operators and CDC ordering edge cases."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.catalog import load_table
from cdc_local_data_pipeline_docker_spark.cdc import latest_state as LS
from cdc_local_data_pipeline_docker_spark.cdc import parse as P
from cdc_local_data_pipeline_docker_spark.operators.relational import agg_approx


@pytest.mark.slow
def test_approx_sketches_error_bounds(spark, sf_dir):
    """The contract-oracle booleans must all hold (each engine's sketch
    within 5% of its own exact value) and exact_orders must equal the
    independently computed exact distinct count."""
    rows = {r.l_returnflag: r for r in agg_approx(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact) and rows
    for flag, r in rows.items():
        assert r.exact_orders == exact[flag], (flag, r.exact_orders)
        assert r.distinct_within_5pct, flag
        assert r.p50_within_5pct and r.p95_within_5pct and r.p99_within_5pct, flag


def test_latest_state_orders_across_partitions(spark, tmp_path):
    """Keyed topics put all of a PK's events in ONE partition; latest-state
    must still pick the winner correctly when different keys live in
    different partitions with interleaved offsets."""
    events = [
        # key 1 lives in partition 0: insert at 0, update at 2
        {"key": '{"order_id": 1}', "value": json.dumps(
            {"order_id": 1, "customer_id": 1, "order_date": 0,
             "status": "pending", "total_amount": "1.00",
             "shipping_address": "a"}), "topic": "t", "partition": 0,
         "offset": 0, "timestamp": 0},
        {"key": '{"order_id": 1}', "value": json.dumps(
            {"order_id": 1, "customer_id": 1, "order_date": 0,
             "status": "shipped", "total_amount": "2.00",
             "shipping_address": "a"}), "topic": "t", "partition": 0,
         "offset": 2, "timestamp": 0},
        # key 2 lives in partition 1: insert at 0, tombstone at 1 — note its
        # offsets OVERLAP partition 0's (offsets are only per-partition)
        {"key": '{"order_id": 2}', "value": json.dumps(
            {"order_id": 2, "customer_id": 2, "order_date": 0,
             "status": "pending", "total_amount": "3.00",
             "shipping_address": "b"}), "topic": "t", "partition": 1,
         "offset": 0, "timestamp": 0},
        {"key": '{"order_id": 2}', "value": None, "topic": "t",
         "partition": 1, "offset": 1, "timestamp": 0},
    ]
    path = tmp_path / "multi_part.jsonl"
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    parsed = P.parse_events(P.read_event_file(spark, str(path)), "orders")
    state = {r.order_id: r for r in LS.latest_state(parsed, "orders").collect()}
    # key 1 → latest update wins; key 2 → deleted
    assert set(state) == {1}
    assert state[1].status == "shipped"
    assert str(state[1].total_amount) == "2.00"


def test_sketch_hll_mergeable_distinct_bounds(spark, sf_dir):
    """Contract rows hold: exact per-group distincts match an independent
    computation, every within_5pct boolean is true (including the UNIONED
    global sketch row — merging group sketches must not degrade the
    estimate class)."""
    from cdc_local_data_pipeline_docker_spark.operators.sketches import (
        sketch_hll_distinct,
    )

    rows = {
        r.l_returnflag: r for r in sketch_hll_distinct(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    exact["ALL"] = li.select("l_orderkey").distinct().count()
    assert set(rows) == set(exact)
    for k, e in exact.items():
        assert rows[k].exact_distinct_orders == e, (k, rows[k], e)
        assert rows[k].within_5pct, (k, rows[k])


def test_sketch_cms_overcount_bounds(spark, sf_dir):
    """CMS estimates never undercount, and overcount by at most eps·N
    (checked with 2x slack for the finite-confidence tail)."""
    from cdc_local_data_pipeline_docker_spark.operators.sketches import (
        CMS_PROBE_TOKENS,
        sketch_cms_token_freq,
    )

    got = {r.token: r for r in sketch_cms_token_freq(spark, sf_dir).collect()}
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    exact = {
        r.tok: r.n
        for r in toks.filter(F.col("tok").isin(*CMS_PROBE_TOKENS))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(CMS_PROBE_TOKENS)
    for t in CMS_PROBE_TOKENS:
        e = exact.get(t, 0)
        assert got[t].exact_freq == e, (t, got[t], e)
        # within_eps pins exact <= estimate <= exact + eps*N engine-side
        assert got[t].within_eps, (t, got[t])


def test_tdigest_rank_error_bound(spark, sf_dir):
    """Two-level t-digest: the rank of each quantile estimate must sit
    within 2% of the requested quantile (compression=100 gives ~1%
    near the median, tighter at the tails)."""
    from pyspark.sql import functions as F

    from cdc_local_data_pipeline_docker_spark.catalog import load_table
    from cdc_local_data_pipeline_docker_spark.operators.sketches import (
        _tdigest_estimates,
    )

    rows = _tdigest_estimates(spark, sf_dir).collect()
    assert {r.quantile for r in rows} == {0.5, 0.9, 0.99}
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    for r in rows:
        rank = li.filter(F.col("l_extendedprice") <= r.estimate).count() / n
        assert abs(rank - r.quantile) <= 0.02, (r.quantile, rank)
