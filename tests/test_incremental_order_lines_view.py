"""Order-lines IVM (streaming/incremental_order_lines_view): maintained
gold ≡ full recompute under any chunking, replay idempotence, and the
DIM-SIDE FAN-OUT rule that distinguishes this view from the
customers⋈orders one — a products-stream change must refresh exactly
the orders whose live lines reference the changed products."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.cdc import parse as P
from cdc_local_data_pipeline_docker_spark.cdc.queries import ensure_fixtures
from cdc_local_data_pipeline_docker_spark.streaming import (
    incremental_order_lines_view as OLV,
)


def _full_recompute(spark):
    from cdc_local_data_pipeline_docker_spark.cdc.queries import (
        cdc_gold_order_lines,
    )

    return sorted(map(tuple, cdc_gold_order_lines(spark, "unused").collect()))


def _view(spark, out):
    return sorted(
        map(
            tuple,
            OLV.read_order_lines_view(spark, out).orderBy("order_id").collect(),
        )
    )


@pytest.mark.parametrize(
    "n_chunks",
    [1, 2, pytest.param(4, marks=pytest.mark.slow)],  # 4-chunk sweep: nightly
)
def test_order_lines_view_matches_recompute_any_chunking(
    spark, tmp_path, n_chunks
):
    d = ensure_fixtures()
    out = str(tmp_path / f"olv{n_chunks}")
    bid = 0
    for topic in ("order_items", "products"):
        env = P.read_event_file(spark, os.path.join(d, f"{topic}.jsonl"))
        hi = env.agg(F.max("offset")).collect()[0][0]
        step = (hi + 1) / n_chunks
        for i in range(n_chunks):
            lo, up = i * step, (i + 1) * step
            OLV.apply_order_lines_batch(
                spark,
                env.filter((F.col("offset") >= lo) & (F.col("offset") < up)),
                topic,
                out,
                bid,
            )
            bid += 1
    assert _view(spark, out) == _full_recompute(spark)


def test_order_lines_view_replay_idempotent(spark, tmp_path):
    d = ensure_fixtures()
    out = str(tmp_path / "olvr")
    envs = {
        t: P.read_event_file(spark, os.path.join(d, f"{t}.jsonl"))
        for t in ("order_items", "products")
    }
    OLV.apply_order_lines_batch(spark, envs["order_items"], "order_items", out, 0)
    OLV.apply_order_lines_batch(spark, envs["products"], "products", out, 1)
    want = _view(spark, out)
    # guard path (same id)
    OLV.apply_order_lines_batch(spark, envs["products"], "products", out, 1)
    assert _view(spark, out) == want
    # tie-win full-path replay (new id, same events)
    OLV.apply_order_lines_batch(spark, envs["order_items"], "order_items", out, 2)
    OLV.apply_order_lines_batch(spark, envs["products"], "products", out, 3)
    assert _view(spark, out) == want


def _env_df(spark, topic, rows):
    """rows: (key_json, value_json_or_None, partition, offset)"""
    data = [
        (k, v, topic, p, o, 1_700_000_000_000_000 + o)
        for (k, v, p, o) in rows
    ]
    return spark.createDataFrame(data, P.ENVELOPE_DDL)


def _item(iid, oid, pid, qty, sub):
    return (
        f'{{"order_item_id": {iid}}}',
        f'{{"order_item_id": {iid}, "order_id": {oid}, "product_id": {pid},'
        f' "quantity": {qty}, "unit_price": "{sub}", "subtotal": "{sub}"}}',
    )


def _prod(pid, cat):
    return (
        f'{{"product_id": {pid}}}',
        f'{{"product_id": {pid}, "product_name": "P{pid}", "category": "{cat}",'
        f' "price": "1.00", "stock_quantity": 1}}',
    )


def test_order_lines_dim_fanout_and_deletes(spark, tmp_path):
    """A product category rewrite refreshes exactly the orders whose
    live lines reference it (n_categories changes); a product tombstone
    NULLs the category (lines survive); an item tombstone removes the
    line and, when it was the order's last, the gold row."""
    out = str(tmp_path / "olvf")
    prods = _env_df(spark, "products", [
        (*_prod(1, "Toys"), 0, 0),
        (*_prod(2, "Food"), 0, 1),
    ])
    items = _env_df(spark, "order_items", [
        (*_item(100, 10, 1, 1, "1.00"), 0, 0),   # order 10: products 1+2
        (*_item(101, 10, 2, 1, "2.00"), 0, 1),
        (*_item(102, 20, 2, 3, "3.00"), 0, 2),   # order 20: product 2 only
    ])
    OLV.apply_order_lines_batch(spark, prods, "products", out, 0)
    OLV.apply_order_lines_batch(spark, items, "order_items", out, 1)
    v = {r[0]: r for r in _view(spark, out)}
    assert v[10] == (10, 2, 2, 3.0, 2, 2)
    assert v[20] == (20, 1, 3, 3.0, 1, 1)

    # rewrite product 2's category: BOTH orders' n_categories recompute,
    # and ONLY those orders carry the new batch id (dim fan-out, not
    # full recompute — checked via the state's last_batch_id)
    recat = _env_df(spark, "products", [(*_prod(2, "Toys"), 0, 2)])
    OLV.apply_order_lines_batch(spark, recat, "products", out, 2)
    v = {r[0]: r for r in _view(spark, out)}
    assert v[10][5] == 1   # Toys+Toys collapse to one category
    assert v[20][5] == 1
    raw = spark.read.parquet(os.path.join(out, "lines_gold_view"))
    touched = {
        r.order_id
        for r in raw.filter(F.col("last_batch_id") == 2).collect()
    }
    assert touched == {10, 20}

    # tombstone product 1: order 10's line SURVIVES with NULL category
    pdel = _env_df(spark, "products", [('{"product_id": 1}', None, 0, 3)])
    OLV.apply_order_lines_batch(spark, pdel, "products", out, 3)
    v = {r[0]: r for r in _view(spark, out)}
    assert v[10] == (10, 2, 2, 3.0, 2, 1)   # 2 lines, 1 non-null category
    raw = spark.read.parquet(os.path.join(out, "lines_gold_view"))
    touched = {
        r.order_id
        for r in raw.filter(F.col("last_batch_id") == 3).collect()
    }
    assert touched == {10}   # order 20 never referenced product 1

    # tombstone order 20's only line: its gold row disappears
    idel = _env_df(spark, "order_items", [
        ('{"order_item_id": 102}', None, 0, 3),
    ])
    OLV.apply_order_lines_batch(spark, idel, "order_items", out, 4)
    v = {r[0]: r for r in _view(spark, out)}
    assert set(v) == {10}


def test_order_lines_multiplexed_stream_matches_recompute(spark, tmp_path):
    """One multiplexed stream over order_items+products files maintains
    the order-lines view ≡ full recompute (AvailableNow drain)."""
    import shutil

    d = ensure_fixtures()
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    for t in ("order_items", "products"):
        shutil.copy(os.path.join(d, f"{t}.jsonl"), in_dir / f"{t}.jsonl")
    out = str(tmp_path / "olv_stream")
    OLV.start_order_lines_view_stream(spark, str(in_dir), out)
    assert _view(spark, out) == _full_recompute(spark)
