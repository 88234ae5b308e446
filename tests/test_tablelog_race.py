"""Concurrent-writer stress for the tablelog commit protocol: REAL OS
processes racing `os.link` on the same log directory (the simulated
single-process conflict test lives in test_tablelog.py). The protocol's
whole claim is that put-if-absent on the manifest name is a sufficient
commit coordinator — so N processes × M optimistic commits each must
serialize into exactly N·M contiguous versions with no loss, no
duplicate wins, and no torn manifests."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import tempfile

import pytest


def _committer(root: str, proc_id: int, n_commits: int, out_q) -> None:
    # runs in a spawned child: import inside so the worker is
    # self-contained (no Spark needed — the race is on the manifest
    # link, which is data-free by design)
    from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

    wins = []
    for i in range(n_commits):
        while True:
            base = TL._latest_version(root)
            version = 0 if base is None else base + 1
            manifest = {
                "version": version,
                "action": "append",
                "add": [],
                "remove": [],
                "stats_add": {},
                "schemas": [],
                "writer": proc_id,
                "seq": i,
                "ts": 0.0,
            }
            try:
                TL._commit(root, version, manifest)
                wins.append(version)
                break
            except TL.CommitConflict:
                continue
    out_q.put((proc_id, wins))


@pytest.mark.parametrize("n_procs,n_commits", [(4, 25)])
def test_multiprocess_commit_race(n_procs, n_commits):
    from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

    root = tempfile.mkdtemp(prefix="tablelog_race_")
    try:
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        procs = [
            ctx.Process(target=_committer, args=(root, p, n_commits, q))
            for p in range(n_procs)
        ]
        for p in procs:
            p.start()
        results = {}
        for _ in range(n_procs):
            pid, wins = q.get(timeout=300)
            results[pid] = wins
        for p in procs:
            p.join(timeout=60)
            assert p.exitcode == 0

        total = n_procs * n_commits
        # 1. versions are exactly 0..total-1 — nothing lost, nothing doubled
        assert TL._versions(root) == list(range(total))
        # 2. every process landed all its commits, in increasing versions
        assert set(results) == set(range(n_procs))
        all_wins = []
        for pid, wins in results.items():
            assert len(wins) == n_commits
            assert wins == sorted(wins)
            all_wins.extend(wins)
        assert sorted(all_wins) == list(range(total))
        # 3. each manifest is well-formed JSON and its (writer, seq)
        #    matches the process that claims the win — no torn writes,
        #    no two writers sharing a version
        for v in range(total):
            m = TL._read_manifest(root, v)
            assert m["version"] == v
            assert v in results[m["writer"]]
            assert results[m["writer"]][m["seq"]] == v
        # 4. no leaked temp files from losing attempts
        leftovers = [
            f
            for f in os.listdir(os.path.join(root, "_log"))
            if f.startswith(".tmp-")
        ]
        assert leftovers == []
        # 5. cadence checkpoints exist (written by whichever racer won
        #    the interval commits) and resolution through them agrees
        #    with pure log replay
        cks = TL._checkpoint_versions(root)
        assert cks, "no cadence checkpoint written during the race"
        snap_with = TL._snapshot(root, total - 1)
        for c in cks:
            shutil.rmtree(
                os.path.join(root, "_log", f"ckpt-v{c:08d}"),
                ignore_errors=True,
            )
        snap_without = TL._snapshot(root, total - 1)
        assert snap_with == snap_without
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_race_survivor_history_is_serializable():
    """After a race, log_history must replay cleanly end-to-end (every
    manifest is a valid delta — the winner sequence is a serial
    history)."""
    from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

    root = tempfile.mkdtemp(prefix="tablelog_race2_")
    try:
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        procs = [
            ctx.Process(target=_committer, args=(root, p, 10, q))
            for p in range(3)
        ]
        for p in procs:
            p.start()
        for _ in range(3):
            q.get(timeout=300)
        for p in procs:
            p.join(timeout=60)
        hist = TL.log_history(root)
        assert [h["version"] for h in hist] == list(range(30))
        assert all(h["n_live"] == 0 for h in hist)  # data-free commits
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SPARK_WORKER = """
import sys
root, proc, sf = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL
orders = spark.read.parquet(sf + "/orders.parquet").select(
    "o_orderkey", "o_orderstatus", "o_totalprice")
for i in range(3):
    sl = orders.filter((F.col("o_orderkey") % 6) == (int(proc) * 3 + i))
    v = TL.log_append(spark, root, sl)
    print("WIN", proc, i, v, flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_two_real_spark_writers_race_appends():
    """The full-stack version of the commit race: two independent Spark
    processes (separate JVMs, separate drivers) concurrently appending
    disjoint slices to the SAME table root. Both must land all three of
    their commits via the optimistic-retry loop, the versions must be
    the contiguous serialization 0..5, and the final snapshot must hold
    every slice exactly once."""
    import subprocess
    import sys

    from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL

    sf = "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="tablelog_spark_race_")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _SPARK_WORKER, root, str(p), sf],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
            )
            for p in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode())
            assert p.returncode == 0, out.decode()[-2000:]
        assert TL._versions(root) == list(range(6))
        # every writer's three commits landed (6 distinct versions total)
        wins = sorted(
            int(line.split()[3])
            for o in outs
            for line in o.splitlines()
            if line.startswith("WIN")
        )
        assert wins == list(range(6))
        # content: the union of the six disjoint slices, exactly once
        snap = TL._snapshot(root)
        import pyarrow.parquet as pq

        keys = []
        for f in snap["live"]:
            keys.extend(
                pq.read_table(os.path.join(root, f))["o_orderkey"].to_pylist()
            )
        assert len(keys) == len(set(keys))
        assert all(k % 6 in range(6) for k in keys)
        expect = len(
            pq.read_table(os.path.join(sf, "orders.parquet"))["o_orderkey"]
        )
        assert len(keys) == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)
