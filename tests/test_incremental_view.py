"""Incremental aggregate view maintenance (streaming/incremental_view.py):
delta-apply ≡ recompute, batch-boundary invariance, and the two
crash-window replay properties the module docstring claims."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.cdc import parse as P
from cdc_local_data_pipeline_docker_spark.cdc.queries import ensure_fixtures
from cdc_local_data_pipeline_docker_spark.streaming import incremental_view as IV

from .oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def env(spark):
    d = ensure_fixtures()
    return P.read_event_file(spark, os.path.join(d, "orders.jsonl"))


@pytest.fixture()
def scratch():
    out = tempfile.mkdtemp(prefix="test_view_state_")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _view_rows(spark, out):
    return sorted(
        (r["status"], r["n_rows"], str(r["total_amount_sum"]))
        for r in IV.read_view(spark, out, "orders").collect()
    )


def _chunks(env, n):
    """Split the changelog into n offset-contiguous batches."""
    offs = sorted(r["offset"] for r in env.select("offset").collect())
    bounds = [offs[int(len(offs) * i / n)] for i in range(1, n)]
    lo = None
    out = []
    for b in bounds + [None]:
        part = env
        if lo is not None:
            part = part.filter(F.col("offset") >= lo)
        if b is not None:
            part = part.filter(F.col("offset") < b)
        out.append(part)
        lo = b
    return out


def test_oracle_parity(spark):
    df = IV.cdc_incremental_agg_view(spark, SF_DIR)
    con = duckdb_connection(SF_DIR)
    ok, msg = compare(df, con, IV.CDC_INCREMENTAL_AGG_VIEW_SQL)
    assert ok, msg


def test_chunking_invariance(spark, env, scratch):
    """1-, 2- and 4-batch replays all converge to the identical view."""
    results = []
    for n in (1, 2, 4):
        out = os.path.join(scratch, f"n{n}")
        for bid, part in enumerate(_chunks(env, n)):
            IV.apply_view_batch(spark, part, "orders", out, bid)
        results.append(_view_rows(spark, out))
    assert results[0] == results[1] == results[2]


def test_replay_after_agg_swap_is_noop(spark, env, scratch):
    """Crash AFTER both swaps → replay is skipped by the batch-id guard."""
    parts = _chunks(env, 2)
    IV.apply_view_batch(spark, parts[0], "orders", scratch, 0)
    IV.apply_view_batch(spark, parts[1], "orders", scratch, 1)
    before = _view_rows(spark, scratch)
    IV.apply_view_batch(spark, parts[1], "orders", scratch, 1)  # replay
    assert _view_rows(spark, scratch) == before


def test_replay_after_keystate_swap_is_zero_delta(spark, env, scratch):
    """Crash BETWEEN the key-state swap and the agg swap: the replayed
    batch recomputes its deltas against the already-merged key-state —
    every row ties with its own stored image, so the group deltas must
    cancel to exactly zero (the property that makes the crash window
    safe without coordination)."""
    parts = _chunks(env, 2)
    IV.apply_view_batch(spark, parts[0], "orders", scratch, 0)
    IV.apply_view_batch(spark, parts[1], "orders", scratch, 1)

    keys = spark.read.parquet(IV.key_state_path(scratch, "orders"))
    delta = P.project_changelog(
        P.parse_events(parts[1], "orders"), "orders"
    ).filter(~F.col("is_malformed"))
    final = IV._batch_final(IV._narrow(delta, "orders"))
    won = IV._winners_with_old(final, keys)
    deltas = IV._group_deltas(won).collect()
    assert all(r["dn"] == 0 and float(r["dv"]) == 0.0 for r in deltas)


def test_streaming_runner_matches_batch(spark, env, scratch):
    """start_view_stream (real foreachBatch drain) converges to the same
    view as the direct batch application."""
    d = ensure_fixtures()
    out_b = os.path.join(scratch, "batch")
    IV.apply_view_batch(spark, env, "orders", out_b, 0)

    out_s = os.path.join(scratch, "stream")
    IV.start_view_stream(spark, d, "orders", out_s)
    assert _view_rows(spark, out_b) == _view_rows(spark, out_s)


def test_products_view_matches_recompute(spark, scratch):
    """The maintainer is table-generic: the products (category -> count,
    sum(price)) view converges to a recompute from materialized latest
    state."""
    from cdc_local_data_pipeline_docker_spark.cdc.ingest import (
        ingest_table,
        materialize_latest,
    )

    d = ensure_fixtures()
    penv = P.read_event_file(spark, os.path.join(d, "products.jsonl"))
    mid = penv.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
    IV.apply_view_batch(spark, penv.filter(F.col("offset") <= mid),
                        "products", scratch, 0)
    IV.apply_view_batch(spark, penv.filter(F.col("offset") > mid),
                        "products", scratch, 1)
    got = sorted(
        (r["category"], r["n_rows"], str(r["price_sum"]))
        for r in IV.read_view(spark, scratch, "products").collect()
    )

    out = os.path.join(scratch, "wh")
    ingest_table(spark, os.path.join(d, "products.jsonl"), "products", out)
    live = materialize_latest(spark, out, "products")
    want = sorted(
        (r["category"], r["n"], str(r["s"]))
        for r in live.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("price").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    )
    assert got == want and got
