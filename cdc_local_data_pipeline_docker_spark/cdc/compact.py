"""Changelog compaction: the maintenance job an append-only CDC sink needs.

Every incremental sync appends a few files; after thousands of 5-minute
runs a table dir holds tens of thousands of tiny files and scan planning
(file listing, footer reads, one task per splittable unit) dominates query
time — the classic small-files problem the reference makes WORSE with
coalesce(1)-per-run (one tiny file per run per table, enhanced.py:203).

`compact_changelog` rewrites a changelog directory to a target file count
sized by bytes (snappy parquet ~128 MB target per file), preserving every
row and column — offsets included, so latest-state and offset-resume
semantics are untouched. The rewrite is atomic-by-rename, with the same
crash story as the upsert maintainer: old data survives until the swap.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

#: Target on-disk bytes per compacted file (cluster-realistic default).
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def recover_compaction(table_dir: str) -> None:
    """Crash recovery for the two-rename swap below: a crash between
    ``rename(table_dir, old)`` and ``rename(tmp, table_dir)`` leaves no
    live dir — restore the old snapshot; sweep stale tmp dirs either way
    (same recovery contract as streaming/upsert._recover_state)."""
    old = f"{table_dir}__compact_old"
    tmp = f"{table_dir}__compact_tmp"
    if not os.path.exists(table_dir) and os.path.exists(old):
        os.rename(old, table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def compact_changelog(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """Rewrite `table_dir` down to ceil(bytes/target) files.

    Returns {files_before, files_after, bytes}. Row-preserving: callers'
    latest-state / resume logic reads the same rows afterwards."""
    recover_compaction(table_dir)  # heal any previously cut-short swap
    files_before = sum(
        1
        for root, _d, fs in os.walk(table_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    size = _dir_bytes(table_dir)
    n_files = max(1, math.ceil(size / target_file_bytes))

    df = spark.read.parquet(table_dir)
    tmp = f"{table_dir}__compact_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    old = f"{table_dir}__compact_old"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)

    files_after = sum(
        1
        for root, _d, fs in os.walk(table_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": size,
    }
