"""Changelog compaction: file-count reduction with row/semantic
preservation (latest-state and offset watermark unchanged)."""

from __future__ import annotations

import json
import os

from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
from cdc_local_data_pipeline_docker_spark.cdc.compact import compact_changelog
from cdc_local_data_pipeline_docker_spark.cdc.ingest import (
    ingest_table,
    materialize_latest,
)


def test_compact_preserves_rows_and_semantics(spark, tmp_path):
    # build a fragmented changelog: 5 incremental syncs → many small files
    events = FX.generate_table_events("orders")
    out = str(tmp_path / "wh")
    fdir = tmp_path / "in"
    fdir.mkdir()
    step = len(events) // 5 + 1
    for i in range(5):
        p = fdir / f"run{i}.jsonl"
        with open(p, "w") as f:
            for e in events[: (i + 1) * step]:
                f.write(
                    json.dumps({k: v for k, v in e.items() if k != "_kind"}) + "\n"
                )
        ingest_table(spark, str(p), "orders", out)

    table_dir = os.path.join(out, "orders_parquet")
    before_rows = spark.read.parquet(table_dir).count()
    before_state = {
        r.order_id: str(r.total_amount)
        for r in materialize_latest(spark, out, "orders").collect()
    }

    report = compact_changelog(spark, table_dir, target_file_bytes=10**9)
    assert report["files_before"] > report["files_after"]
    assert report["files_after"] == 1  # everything fits one target file

    # rows, offsets, latest-state all preserved
    after = spark.read.parquet(table_dir)
    assert after.count() == before_rows
    assert after.select("kafka_offset").distinct().count() == before_rows
    after_state = {
        r.order_id: str(r.total_amount)
        for r in materialize_latest(spark, out, "orders").collect()
    }
    assert after_state == before_state

    # ...and a post-compaction incremental sync still no-ops correctly
    m = ingest_table(spark, str(fdir / "run4.jsonl"), "orders", out)
    assert m["n_rows"] == 0


def test_compact_swap_crash_recovery(spark, tmp_path):
    """A crash between the swap's two renames leaves only __compact_old;
    the next compaction (or explicit recovery) must restore it rather than
    operating on a missing dir."""
    import os

    from cdc_local_data_pipeline_docker_spark.cdc.compact import (
        recover_compaction,
    )

    d = str(tmp_path / "t")
    spark.range(100).write.parquet(d)
    before = spark.read.parquet(d).count()

    os.rename(d, f"{d}__compact_old")  # simulate the crash window
    os.makedirs(f"{d}__compact_tmp")
    recover_compaction(d)
    assert os.path.exists(d) and not os.path.exists(f"{d}__compact_tmp")
    assert spark.read.parquet(d).count() == before

    # end-to-end: crash again, then compaction itself recovers first
    os.rename(d, f"{d}__compact_old")
    report = compact_changelog(spark, d, target_file_bytes=10**9)
    assert spark.read.parquet(d).count() == before
    assert report["files_after"] >= 1
