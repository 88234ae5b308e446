"""applyInPandasWithState across multiple micro-batches, and the
run_pipeline CLI end-to-end."""

from __future__ import annotations

import pytest

import json
import subprocess
import sys

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from cdc_local_data_pipeline_docker_spark.streaming.stateful import (
    _OUTPUT_DDL,
    _STATE_DDL,
    _update_user_state,
)


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1); user 1 appears in all
    three — the state store must carry the running totals across batches,
    emitting monotone updates whose last value is the global total."""
    d = tmp_path / "in"
    d.mkdir()
    import os

    batches = [
        [(1, 1.00), (2, 2.00)],
        [(1, 3.00)],
        [(1, 4.00), (2, 5.00)],
    ]
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for uid, val in rows:
                f.write(json.dumps({"user_id": uid, "value": val}) + "\n")
        os.utime(p, (1000 + i, 1000 + i))

    src = (
        spark.readStream.schema("user_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUTPUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("stateful_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("stateful_mb").collect()
    # user 1 got one update per batch it appeared in — running values
    u1 = sorted((r.n_events, r.total_cents) for r in rows if r.user_id == 1)
    assert u1 == [(1, 100), (2, 400), (3, 800)]
    u2 = sorted((r.n_events, r.total_cents) for r in rows if r.user_id == 2)
    assert u2 == [(1, 200), (2, 700)]


@pytest.mark.slow
def test_run_pipeline_cli_end_to_end(tmp_path):
    """The orchestrator CLI: one command syncs all four tables, reruns are
    no-ops, and the JSON report carries live-row counts."""
    out = str(tmp_path / "wh")
    cmd = [
        sys.executable, "-m",
        "cdc_local_data_pipeline_docker_spark.run_pipeline",
        "--out-dir", out, "--tables", "orders,customers",
    ]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
           "SPARK_GRAFT_CPUS": "8"}
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rep1 = json.loads(r1.stdout.strip().splitlines()[-1])
    by_table = {t["table"]: t for t in rep1["tables"]}
    assert by_table["orders"]["live_rows"] > 0
    assert by_table["orders"]["n_quarantined"] == 3

    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    for t in rep2["tables"]:
        assert t["n_rows"] == 0  # watermark no-op
        assert t["live_rows"] == by_table[t["table"]]["live_rows"]


@pytest.mark.slow
def test_run_pipeline_cli_sketch_state(tmp_path):
    """--sketch-state maintains the per-table ingest sketches and reports
    exact count + HLL distinct + digest quantiles alongside the sync."""
    out = str(tmp_path / "wh")
    cmd = [
        sys.executable, "-m",
        "cdc_local_data_pipeline_docker_spark.run_pipeline",
        "--out-dir", out, "--tables", "orders", "--sketch-state",
    ]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
           "SPARK_GRAFT_CPUS": "8",
           # the digest stage runs applyInPandas — python workers must be
           # THIS interpreter (the stripped PATH would resolve a bare
           # python3 without pandas)
           "PYSPARK_PYTHON": sys.executable}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    sk = rep["tables"][0]["sketch"]
    assert sk["n_rows"] > 0
    # HLL at lgK=12 on ~40 keys is exact-ish; 5% is the contract bound
    assert abs(sk["approx_distinct_keys"] - 42) <= 0.05 * 42
    assert sk["p50"] <= sk["p90"] <= sk["p99"]


@pytest.mark.slow
def test_run_pipeline_cli_multi_topic(tmp_path):
    """--multi-topic drains all tables through ONE streaming query with a
    single checkpoint; live-row counts match the per-table batch mode and
    a rerun is a checkpointed no-op (counts unchanged)."""
    import os

    out_batch = str(tmp_path / "wh_batch")
    out_multi = str(tmp_path / "wh_multi")
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
           "SPARK_GRAFT_CPUS": "8"}
    base = [
        sys.executable, "-m",
        "cdc_local_data_pipeline_docker_spark.run_pipeline",
        "--tables", "orders,customers",
    ]
    rb = subprocess.run(base + ["--out-dir", out_batch],
                        capture_output=True, text=True, env=env, timeout=300)
    assert rb.returncode == 0, rb.stderr[-2000:]
    rm = subprocess.run(base + ["--out-dir", out_multi, "--multi-topic"],
                        capture_output=True, text=True, env=env, timeout=300)
    assert rm.returncode == 0, rm.stderr[-2000:]

    def live(stdout):
        rep = json.loads(stdout.strip().splitlines()[-1])
        return sorted((t["table"], t["live_rows"]) for t in rep["tables"])

    assert live(rb.stdout) == live(rm.stdout)
    # one checkpoint for the whole fan-out, and NO per-table offset files
    assert os.listdir(os.path.join(out_multi, "_checkpoints")) == ["_all_topics"]
    assert not os.path.exists(os.path.join(out_multi, "_cdc_state"))

    rm2 = subprocess.run(base + ["--out-dir", out_multi, "--multi-topic"],
                         capture_output=True, text=True, env=env, timeout=300)
    assert rm2.returncode == 0, rm2.stderr[-2000:]
    assert live(rm2.stdout) == live(rm.stdout)


@pytest.mark.slow
def test_run_pipeline_cli_parallel_tables(tmp_path):
    """--parallel N ingests tables on concurrent driver threads (the
    multi-topic analogue of Kafka consumer-group parallelism). Per-table
    offset state is independent, so the report must be identical to a
    sequential run."""
    out_seq = str(tmp_path / "wh_seq")
    out_par = str(tmp_path / "wh_par")
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
           "SPARK_GRAFT_CPUS": "8"}
    base = [
        sys.executable, "-m",
        "cdc_local_data_pipeline_docker_spark.run_pipeline",
        "--tables", "orders,customers,products,order_items",
    ]
    rs = subprocess.run(base + ["--out-dir", out_seq],
                        capture_output=True, text=True, env=env, timeout=300)
    assert rs.returncode == 0, rs.stderr[-2000:]
    rp = subprocess.run(base + ["--out-dir", out_par, "--parallel", "4"],
                        capture_output=True, text=True, env=env, timeout=300)
    assert rp.returncode == 0, rp.stderr[-2000:]

    def canon(stdout):
        rep = json.loads(stdout.strip().splitlines()[-1])
        return sorted(
            (t["table"], t["n_rows"], t["live_rows"], t["high_watermark"])
            for t in rep["tables"]
        )

    assert canon(rs.stdout) == canon(rp.stdout)


def test_udtf_ngram_exploder_matches_codegen_shingler(spark, sf_dir):
    """Spark-4 Python UDTF surface (SQL LATERAL + DataFrame lateralJoin):
    both forms must emit BIT-IDENTICAL rows to the codegen'd
    higher-order-array n-gram explode (llmops/dedup._span_grams) over
    the real corpus — the API is pinned, and so is the fact that the
    declarative hot path loses nothing semantically."""
    from cdc_local_data_pipeline_docker_spark.catalog import load_table
    from cdc_local_data_pipeline_docker_spark.functions.udtfs import (
        explode_ngrams_udtf,
        explode_ngrams_udtf_api,
    )
    from cdc_local_data_pipeline_docker_spark.llmops.dedup import (
        SPAN_N,
        _span_grams,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # string-keyed twin: the UDTF emits gram TEXT (the default production
    # path emits xxhash64(gram) keys since round 6)
    want = sorted(map(tuple, _span_grams(docs, hashed=False).collect()))
    got_sql = sorted(map(tuple, explode_ngrams_udtf(spark, docs, SPAN_N).collect()))
    got_api = sorted(map(tuple, explode_ngrams_udtf_api(docs, SPAN_N).collect()))
    assert got_sql == want and got_api == want and len(want) > 0


def test_run_pipeline_agg_view_flag(spark, tmp_path, capsys):
    """--agg-view maintains and reports the incremental grouped view for
    tables carrying a VIEW_SPECS entry; values equal a recompute from the
    materialized latest state."""
    import json

    from cdc_local_data_pipeline_docker_spark import run_pipeline as RP
    from cdc_local_data_pipeline_docker_spark.cdc.ingest import (
        materialize_latest,
    )
    from pyspark.sql import functions as F

    out = str(tmp_path / "wh")
    rc = RP.main(["--out-dir", out, "--tables", "orders", "--agg-view"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    view = rep["tables"][0]["agg_view"]
    assert view, "agg_view missing from the CLI report"

    live = materialize_latest(spark, out, "orders")
    want = {
        r["status"]: (r["n"], float(r["s"]))
        for r in live.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("total_amount").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    got = {d["status"]: (d["n_rows"], float(d["total_amount_sum"])) for d in view}
    assert got == want


@pytest.mark.slow
def test_run_pipeline_gold_views_flag(spark, tmp_path, capsys):
    """--gold-views maintains BOTH multi-topic gold join views via the
    multiplexed IVM streams and reports them; values equal the two-replay
    recompute queries."""
    import json

    from cdc_local_data_pipeline_docker_spark import run_pipeline as RP
    from cdc_local_data_pipeline_docker_spark.cdc.queries import (
        cdc_gold_customer_orders,
        cdc_gold_order_lines,
    )

    out = str(tmp_path / "wh")
    rc = RP.main(["--out-dir", out, "--gold-views"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    got_cust = {
        d["customer_id"]: (d["n_orders"], round(d["total_spend"], 2))
        for d in rep["gold_customer_orders"]
    }
    want_cust = {
        r.customer_id: (r.n_orders, round(r.total_spend, 2))
        for r in cdc_gold_customer_orders(spark, "unused").collect()
    }
    assert got_cust == want_cust

    got_lines = {
        d["order_id"]: (d["n_lines"], d["total_units"],
                        round(d["order_subtotal"], 2), d["n_products"],
                        d["n_categories"])
        for d in rep["gold_order_lines"]
    }
    want_lines = {
        r.order_id: (r.n_lines, r.total_units, round(r.order_subtotal, 2),
                     r.n_products, r.n_categories)
        for r in cdc_gold_order_lines(spark, "unused").collect()
    }
    assert got_lines == want_lines


def test_run_pipeline_compact_flag(spark, tmp_path, capsys):
    """--compact reports the compacted-changelog summary per table and its
    numbers reconcile with the pipeline's own state: n_keys − delete
    markers = live rows, and the fold counts cover every non-malformed
    event (n_events = fold_ratio × n_keys)."""
    import json

    from cdc_local_data_pipeline_docker_spark import run_pipeline as RP
    from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX

    out = str(tmp_path / "wh")
    rc = RP.main(["--out-dir", out, "--tables", "orders", "--compact"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = rep["tables"][0]
    c = t["compact"]
    assert c["n_keys"] - c["n_delete_markers"] == t["live_rows"]
    events = FX.generate_table_events("orders")
    n_good = sum(1 for e in events if e["_kind"] != "malformed")
    assert round(c["fold_ratio"] * c["n_keys"]) == n_good
    assert c["n_delete_markers"] > 0


@pytest.mark.slow
def test_run_pipeline_cli_tablelog_flag(tmp_path):
    """--tablelog maintains an ACID table per topic; its live rows equal
    the CLI's own latest-state counts, and a rerun (watermark no-op
    ingest, but a fresh stream checkpoint is NOT used — same events)
    leaves the table at the same row count via the batch-id guard."""
    out = str(tmp_path / "wh")
    cmd = [
        sys.executable, "-m",
        "cdc_local_data_pipeline_docker_spark.run_pipeline",
        "--out-dir", out, "--tables", "orders", "--tablelog",
    ]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
           "SPARK_GRAFT_CPUS": "8"}
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rep = json.loads(r1.stdout.strip().splitlines()[-1])
    tl = {t["table"]: t for t in rep["tablelog"]}
    live = {t["table"]: t["live_rows"] for t in rep["tables"]}
    assert tl["orders"]["n_live_rows"] == live["orders"] > 0
    assert tl["orders"]["n_live_files"] >= 1
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    tl2 = {t["table"]: t for t in rep2["tablelog"]}
    assert tl2["orders"]["n_live_rows"] == tl["orders"]["n_live_rows"]
