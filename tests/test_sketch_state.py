"""Incrementally-maintained ingest sketches (streaming/sketch_state.py):
batch-boundary invariance and the streaming drive."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
from cdc_local_data_pipeline_docker_spark.cdc import parse as P
from cdc_local_data_pipeline_docker_spark.streaming.sketch_state import (
    merge_batch_sketches,
    probe_key_frequency,
    read_sketch_summary,
    start_sketch_stream,
)


def _summary_row(spark, out):
    return read_sketch_summary(spark, out, "orders").collect()[0]


@pytest.mark.slow
def test_sketch_state_two_batch_replay_equals_oneshot(spark, tmp_path):
    """Replaying the event log in two chunks yields the SAME exact count
    and the SAME HLL distinct estimate as one shot (HLL union is a
    per-register max — chunking cannot move it), and a merged digest whose
    quantile estimates satisfy the one-shot rank contract."""
    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    env = P.read_event_file(spark, f"{d}/orders.jsonl")
    mid = env.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]

    out_inc = str(tmp_path / "inc")
    merge_batch_sketches(spark, env.filter(F.col("offset") <= mid), "orders", out_inc, 0)
    merge_batch_sketches(spark, env.filter(F.col("offset") > mid), "orders", out_inc, 1)
    out_one = str(tmp_path / "one")
    merge_batch_sketches(spark, env, "orders", out_one, 0)

    inc, one = _summary_row(spark, out_inc), _summary_row(spark, out_one)
    assert inc["n_rows"] == one["n_rows"] > 0
    assert inc["approx_distinct_keys"] == one["approx_distinct_keys"]

    # rank contract for the merged digest: each estimate's true rank over
    # the full value set sits near its requested quantile (granularity on
    # the small fixture is ~1/n, so the tolerance is 3/n-ish wide)
    vals = sorted(
        r["total_amount"]
        for r in P.project_changelog(P.parse_events(env, "orders"), "orders")
        .filter(~F.col("is_malformed") & ~F.col("is_tombstone"))
        .select(F.col("total_amount").cast("double").alias("total_amount"))
        .collect()
        if r["total_amount"] is not None
    )
    n = len(vals)
    for q, est in ((0.5, inc["p50"]), (0.9, inc["p90"]), (0.99, inc["p99"])):
        rank = sum(v <= est for v in vals) / n
        assert abs(rank - q) <= max(0.05, 3.0 / n), (q, est, rank)

    # CMS hot-key counts: merge is elementwise counter addition, so the
    # two-batch replay must give IDENTICAL estimates to one-shot, and
    # every estimate must satisfy exact <= est <= exact + eps*N
    exact = {}
    for r in (
        P.project_changelog(P.parse_events(env, "orders"), "orders")
        .filter(F.expr("NOT is_malformed AND NOT is_tombstone"))
        .groupBy(F.col("pk").cast("string").alias("k"))
        .count()
        .collect()
    ):
        exact[r["k"]] = r["count"]
    keys = sorted(exact)
    est_inc = probe_key_frequency(spark, out_inc, "orders", keys)
    est_one = probe_key_frequency(spark, out_one, "orders", keys)
    assert est_inc == est_one
    n_total = sum(exact.values())
    for k in keys:
        assert exact[k] <= est_inc[k] <= exact[k] + 0.001 * n_total + 1, (
            k, exact[k], est_inc[k],
        )


@pytest.mark.slow
def test_sketch_state_replayed_batch_is_noop(spark, tmp_path):
    """A replayed micro-batch (crash between the state swap and the
    streaming commit-log write) must NOT double-count: the state stores
    the last-applied batch_id and skips batch_id <= last (ADVICE r4,
    medium). Additive components (exact n, CMS counters, digest) are the
    ones at risk — HLL alone would mask the bug."""
    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    env = P.read_event_file(spark, f"{d}/orders.jsonl")
    mid = env.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
    out = str(tmp_path / "state")

    merge_batch_sketches(spark, env.filter(F.col("offset") <= mid), "orders", out, 0)
    merge_batch_sketches(spark, env.filter(F.col("offset") > mid), "orders", out, 1)
    before = _summary_row(spark, out)
    keys = ["1", "2", "3"]
    cms_before = probe_key_frequency(spark, out, "orders", keys)

    # replay batch 1 (the crash-recovery path re-runs the last batch)
    merge_batch_sketches(spark, env.filter(F.col("offset") > mid), "orders", out, 1)
    after = _summary_row(spark, out)
    assert after["n_rows"] == before["n_rows"]
    assert after["approx_distinct_keys"] == before["approx_distinct_keys"]
    assert after["p50"] == before["p50"]
    assert probe_key_frequency(spark, out, "orders", keys) == cms_before


@pytest.mark.slow
def test_sketch_state_empty_batch_merge_is_safe(spark, tmp_path):
    """An empty micro-batch (tombstone-only / no rows) aggregates to NULL
    sketches; the merge path must pass the non-null side through instead
    of raising TypeError and killing the stream (ADVICE r4)."""
    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    env = P.read_event_file(spark, f"{d}/orders.jsonl")
    out = str(tmp_path / "state")

    # empty-first: the initial state row carries NULL sketches
    merge_batch_sketches(spark, env.filter(F.lit(False)), "orders", out, 0)
    s0 = _summary_row(spark, out)
    assert s0["n_rows"] == 0 and s0["approx_distinct_keys"] == 0
    assert probe_key_frequency(spark, out, "orders", ["1"]) == {"1": 0}

    # real batch merges INTO the null state; then another empty on top
    merge_batch_sketches(spark, env, "orders", out, 1)
    merge_batch_sketches(spark, env.filter(F.lit(False)), "orders", out, 2)
    s = _summary_row(spark, out)
    assert s["n_rows"] > 0 and s["approx_distinct_keys"] > 0


def test_sketch_state_streaming_drive_and_idempotent_redrain(spark, tmp_path):
    """start_sketch_stream drains the log into sketch state; a second
    drain over the same checkpoint is a no-op (no double counting)."""
    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    out = str(tmp_path / "state")
    start_sketch_stream(spark, d, "orders", out)
    first = _summary_row(spark, out)
    assert first["n_rows"] > 0 and first["approx_distinct_keys"] > 0

    start_sketch_stream(spark, d, "orders", out)
    again = _summary_row(spark, out)
    assert again["n_rows"] == first["n_rows"]
    assert again["approx_distinct_keys"] == first["approx_distinct_keys"]
