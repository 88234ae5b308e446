"""foreachBatch incremental latest-state maintenance: per-batch merge,
delete markers, checkpoint resume, replay-oracle equality."""

from __future__ import annotations

import json

from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
from cdc_local_data_pipeline_docker_spark.streaming.upsert import (
    read_state,
    start_upsert_stream,
)


def _dump(path, evs):
    with open(path, "w") as f:
        for e in evs:
            f.write(json.dumps({k: v for k, v in e.items() if k != "_kind"}) + "\n")


def test_upsert_stream_incremental_state(spark, tmp_path):
    events = FX.generate_table_events("orders")
    in_dir = tmp_path / "in"
    out = str(tmp_path / "wh")
    in_dir.mkdir()

    # drain 1: first 50 events
    _dump(in_dir / "orders_a.jsonl", events[:50])
    start_upsert_stream(spark, str(in_dir), "orders", out)
    s1 = {r.order_id for r in read_state(spark, out, "orders").collect()}
    assert s1 == set(FX.expected_live_rows(events[:50], "orders"))

    # drain 2: the rest (incl. tombstones + malformed) — only the delta
    # merges; final state equals the full replay oracle
    _dump(in_dir / "orders_b.jsonl", events[50:])
    start_upsert_stream(spark, str(in_dir), "orders", out)
    expected = FX.expected_live_rows(events, "orders")
    state = {
        r.order_id: r for r in read_state(spark, out, "orders").collect()
    }
    assert set(state) == set(expected)
    for k, exp in expected.items():
        assert str(state[k].total_amount) == exp["total_amount"]
        assert state[k].status == exp["status"]

    # drain 3: nothing new — state byte-identical (checkpoint no-op)
    start_upsert_stream(spark, str(in_dir), "orders", out)
    state3 = {r.order_id for r in read_state(spark, out, "orders").collect()}
    assert state3 == set(expected)

    # deleted keys stayed deleted across the incremental merges
    deleted = {
        json.loads(e["key"])["order_id"]
        for e in events
        if e["_kind"] == "tombstone"
    }
    assert not (deleted & state3 - set(expected))
    assert all(k not in state3 for k in deleted - set(expected))
