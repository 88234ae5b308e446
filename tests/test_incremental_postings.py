"""Incrementally-maintained inverted index: delta maintenance equals a
full rebuild bit-for-bit, under chunking, no-op updates, tombstones, and
replay."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.llmops import retrieval as RV
from cdc_local_data_pipeline_docker_spark.streaming import (
    incremental_postings as IP,
)

SF = "/root/testdata/sf0.001"


def _state_snapshot(spark, d):
    tf, dl, df, stats = IP.index_frames(spark, d)
    return (
        {(r.doc_id, r.token): r.tf for r in tf.collect()},
        {r.doc_id: r.dl for r in dl.collect()},
        {r.token: r.df for r in df.collect()},
        tuple(stats.collect()[0]),
    )


@pytest.fixture(scope="module")
def final_state(spark):
    """The ground truth: index built in one shot from `documents`."""
    tf, dl, df, stats = RV._postings(spark, SF)
    return (
        {(r.doc_id, r.token): r.tf for r in tf.collect()},
        {r.doc_id: r.dl for r in dl.collect()},
        {r.token: r.df for r in df.collect()},
        tuple(stats.collect()[0]),
    )


@pytest.mark.slow
def test_three_batch_churn_converges_to_rebuild(spark, final_state):
    d = tempfile.mkdtemp(prefix="pivm_")
    try:
        IP.init_state(spark, d)
        batches = IP.build_fixture_batches(spark, SF)
        for i, b in enumerate(batches):
            apply_before = _state_snapshot(spark, d)
            IP.apply_batch(spark, d, b, i)
            if i == 2:
                # batch 3 rewrites identical text: deltas must cancel
                after = _state_snapshot(spark, d)
                assert after[:3] == apply_before[:3]
        got = _state_snapshot(spark, d)
        assert got[:3] == final_state[:3]
        assert got[3][:2] == final_state[3][:2]
        # the perturbation tokens and the synthetic doc are gone
        assert -1 not in got[1]
        assert "perturbed" not in got[2]
        # replay of an already-applied batch is a no-op
        IP.apply_batch(spark, d, batches[1], 1)
        assert _state_snapshot(spark, d) == got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_chunking_invariance_one_shot_equals_three(spark, final_state):
    d = tempfile.mkdtemp(prefix="pivm1_")
    try:
        IP.init_state(spark, d)
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text", F.lit(0).alias("seq")
        )
        IP.apply_batch(spark, d, docs, 0)
        got = _state_snapshot(spark, d)
        assert got[:3] == final_state[:3]
        assert got[3][:2] == final_state[3][:2]
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_incremental_topk_equals_batch_entry(spark):
    inc = [
        tuple(r)
        for r in IP.search_bm25_topk_incremental(spark, SF).collect()
    ]
    batch = [tuple(r) for r in RV.search_bm25_topk(spark, SF).collect()]
    assert inc == batch
