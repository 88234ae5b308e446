#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a single Spark action (collect) on an already-warm
SparkSession, so the numbers measure plan execution, not JVM startup.
A free warm-up action runs first to amortize class-loading / codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_local_data_pipeline_docker_spark import registry
from cdc_local_data_pipeline_docker_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the flagship + the heaviest representatives of each
#: operator family (multi-join analytics, broadcast star join, windows,
#: dedup/similarity). Kept ~10 so the per-round bench stays fast.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_dims",
    "join_inner",
    "agg_grouped",
    "window_topk_per_group",
    "sort_limit_topn",
]
#: Optional entries benched when present in the registry (added by later
#: build phases); missing names are skipped silently.
OPTIONAL = [
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "events_tumbling_agg",
]


def main() -> None:
    queries = registry.queries()
    names = HEADLINE + [n for n in OPTIONAL if n in queries]

    # Local testdata tables are single small files: split scans finer than
    # the 128 MB cluster default so all cores participate.
    # (A/B-measured at sf0.1: 4 MB splits beat both 1 MB and the 128 MB
    # cluster default on these ~10 MB single-file tables.)
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST_BYTES", str(512 * 1024))
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch the biggest table once (codegen, parquet footer cache).
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # Two timed runs per query, report the min: the steady-state number a
    # resident engine delivers (first run pays one-off codegen compilation).
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
