"""Kafka option-builder logic (pure) and partitioned-parquet sink
round-trip with partition pruning."""

from __future__ import annotations

import json

import pytest

from cdc_local_data_pipeline_docker_spark.catalog import load_table
from cdc_local_data_pipeline_docker_spark.plans import audit as A
from cdc_local_data_pipeline_docker_spark.sources import kafka as K
from cdc_local_data_pipeline_docker_spark.sources import sinks as S


def test_starting_offsets_first_run_is_earliest():
    assert K.starting_offsets_json("t", None) == "earliest"
    assert K.starting_offsets_json("t", {}) == "earliest"


def test_starting_offsets_resume_plus_one_all_partitions():
    """The +1 resume arithmetic, for EVERY partition (the reference
    hardcoded partition 0, enhanced.py:94-96)."""
    v = json.loads(K.starting_offsets_json("dbserver1.ecommerce.orders",
                                           {0: 41, 1: 7}))
    assert v == {"dbserver1.ecommerce.orders": {"0": 42, "1": 8}}


def test_kafka_batch_options_surface():
    opts = K.kafka_batch_options("kafka:9092", "t", {0: 5})
    assert opts["kafka.bootstrap.servers"] == "kafka:9092"
    assert opts["subscribe"] == "t"
    assert json.loads(opts["startingOffsets"]) == {"t": {"0": 6}}
    assert opts["endingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "false"


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Fact-fact join between co-bucketed tables must plan with NO exchange
    on either join side (the ingest-time bucketing satisfies the join's
    distribution requirement) — the amortized-shuffle strategy for keys too
    big to broadcast."""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        S.write_bucketed(
            load_table(spark, sf_dir, "orders"),
            "t_orders_b", str(tmp_path / "ob"), "o_orderkey", 8,
        )
        S.write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            "t_lineitem_b", str(tmp_path / "lb"), "l_orderkey", 8,
        )
        o = S.read_bucketed(spark, "t_orders_b")
        li = S.read_bucketed(spark, "t_lineitem_b")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = A.formatted_plan(j)
        # the only exchange is the final tiny aggregation, not the join
        assert A.count(plan, "Exchange") == 1, plan
        # correctness unchanged vs a plain join on the raw tables
        raw = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, raw.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


@pytest.mark.slow
def test_partitioned_sink_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = load_table(spark, sf_dir, "orders")
    S.write_partitioned(orders, path, date_col="o_orderdate")

    back = S.read_partitioned(spark, path)
    assert back.count() == orders.count()
    # multiple partition directories, no coalesce(1) bottleneck
    n_parts = back.select("ingest_date").distinct().count()
    assert n_parts > 1

    # a date filter must prune at the partition level, not post-scan
    one_day = back.select("ingest_date").distinct().limit(1).collect()[0][0]
    pruned = back.filter(back.ingest_date == one_day)
    plan = A.formatted_plan(pruned)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "ingest_date" in m.group(1), plan


def test_s3a_conf_env_gated():
    """Object-store parity (reference enhanced.py:56-65): the fs.s3a.*
    block lands when the endpoint env var is set, and is absent otherwise."""
    from cdc_local_data_pipeline_docker_spark.session import s3a_conf

    assert s3a_conf(env={}) == {}
    conf = s3a_conf(env={
        "SPARK_GRAFT_S3_ENDPOINT": "http://minio:9000",
        "SPARK_GRAFT_S3_ACCESS_KEY": "minioadmin",
        "SPARK_GRAFT_S3_SECRET_KEY": "minioadmin",
    })
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "minioadmin"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "minioadmin"


def test_python_datasource_cdc_events(spark, tmp_path):
    """The custom cdc_events Python data source (Spark 4 Data Source API)
    reads the wire format with the fixed envelope schema, one partition
    per file, and offset pushdown inside the reader."""
    from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
    from cdc_local_data_pipeline_docker_spark.cdc import parse as P
    from cdc_local_data_pipeline_docker_spark.sources import pydatasource as PDS

    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    PDS.register(spark)

    via_ds = (
        spark.read.format("cdc_events")
        .option("path", f"{d}/orders.jsonl")
        .load()
    )
    via_json = P.read_event_file(spark, f"{d}/orders.jsonl")
    assert via_ds.count() == via_json.count()
    a = {(r.offset, r.key, r.value) for r in via_ds.collect()}
    b = {(r.offset, r.key, r.value) for r in via_json.collect()}
    assert a == b

    # offset pushdown: resume past watermark 29 yields only later offsets
    resumed = (
        spark.read.format("cdc_events")
        .option("path", f"{d}/orders.jsonl")
        .option("startingOffset", 29)
        .load()
    )
    offs = [r.offset for r in resumed.collect()]
    assert offs and min(offs) == 30

    # directory read: one partition per file, all four topics unioned
    all_topics = (
        spark.read.format("cdc_events").option("path", d).load()
    )
    assert all_topics.select("topic").distinct().count() == 4
    assert all_topics.rdd.getNumPartitions() == 4


def test_python_datasource_streaming_drain_and_resume(spark, tmp_path):
    """cdc_events streamReader (Spark 4 Data Source streaming API): an
    AvailableNow drain equals the batch read; a second drain over the SAME
    checkpoint after the log grew reads ONLY the appended lines (the
    per-file line-offset dict is the resume state, like Kafka offsets)."""
    import json as _json

    from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
    from cdc_local_data_pipeline_docker_spark.sources import pydatasource as PDS

    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    PDS.register(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("cdc_events")
            .option("path", f"{d}/orders.jsonl")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    batch = spark.read.format("cdc_events").option("path", f"{d}/orders.jsonl").load()
    first = spark.read.parquet(sink)
    assert {(r.offset, r.key) for r in first.collect()} == {
        (r.offset, r.key) for r in batch.collect()
    }

    # the log grows by two records; the resumed drain must pick up exactly
    # those (no re-read of history, no loss)
    n0 = first.count()
    top = max(r.offset for r in batch.collect())
    with open(f"{d}/orders.jsonl", "a") as f:
        for i in (1, 2):
            f.write(
                _json.dumps(
                    {
                        "key": f'{{"order_id": {9000 + i}}}',
                        "value": None,
                        "topic": "dbserver1.public.orders",
                        "partition": 0,
                        "offset": top + i,
                        "timestamp": 1700000000000 + i,
                    }
                )
                + "\n"
            )
    drain()
    after = spark.read.parquet(sink)
    assert after.count() == n0 + 2
    new_offs = {r.offset for r in after.collect()} - {
        r.offset for r in first.collect()
    }
    assert new_offs == {top + 1, top + 2}


def test_ingest_stream_via_custom_source_matches_json_path(spark, tmp_path):
    """start_ingest_stream with the cdc_events source produces the exact
    changelog the generic json file stream produces — the custom source is
    a drop-in for the reference-parity ingest chain (S1 wire parity as far
    as the sandbox allows)."""
    from cdc_local_data_pipeline_docker_spark.cdc import fixtures as FX
    from cdc_local_data_pipeline_docker_spark.streaming import ingest_stream as IS

    d = str(tmp_path / "events")
    FX.write_fixtures(d)
    out_json = str(tmp_path / "out_json")
    out_ds = str(tmp_path / "out_ds")
    IS.start_ingest_stream(spark, d, "orders", out_json)
    IS.start_ingest_stream(spark, d, "orders", out_ds, use_custom_source=True)

    a = spark.read.parquet(f"{out_json}/orders_parquet")
    b = spark.read.parquet(f"{out_ds}/orders_parquet")
    assert sorted(a.columns) == sorted(b.columns)
    from collections import Counter

    cols = sorted(a.columns)
    ra = Counter(tuple(row[c] for c in cols) for row in a.collect())
    rb = Counter(tuple(row[c] for c in cols) for row in b.collect())
    assert ra == rb and sum(ra.values()) > 0


def test_text_sources_malformed_policies(spark, tmp_path):
    """Fixed-schema CSV/JSONL reads: PERMISSIVE captures the raw corrupt
    record for replay, DROPMALFORMED drops it, FAILFAST raises."""
    import pytest as _pytest

    from cdc_local_data_pipeline_docker_spark.sources import text_sources as TS

    csv = tmp_path / "rows.csv"
    csv.write_text("id,price\n1,10.5\n2,not_a_number\n3,30.0\n")
    jl = tmp_path / "rows.jsonl"
    jl.write_text('{"id": 1, "price": 10.5}\n{"id": 2, "price": broken\n')

    ddl = "id INT, price DOUBLE"

    good, bad = TS.split_corrupt(TS.read_csv(spark, str(csv), ddl))
    assert {r.id for r in good.collect()} == {1, 3}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0][TS.CORRUPT_COL]

    dropped = TS.read_csv(spark, str(csv), ddl, mode="DROPMALFORMED")
    assert {r.id for r in dropped.collect()} == {1, 3}

    with _pytest.raises(Exception):
        TS.read_csv(spark, str(csv), ddl, mode="FAILFAST").collect()

    jgood, jbad = TS.split_corrupt(TS.read_jsonl(spark, str(jl), ddl))
    assert {r.id for r in jgood.collect()} == {1}
    assert jbad.count() == 1


def test_schema_evolution_additive_merge(spark, tmp_path):
    """Appends with an added column merge into one unified schema; rows
    predating the column read as NULL — the changelog keeps working when
    the upstream CDC source grows a field."""
    from cdc_local_data_pipeline_docker_spark.sources.sinks import read_evolved

    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id LONG, status STRING"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", "express")], "id LONG, status STRING, ship_mode STRING"
    ).write.mode("append").parquet(p)

    merged = read_evolved(spark, p)
    assert set(merged.columns) == {"id", "status", "ship_mode"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].ship_mode is None and rows[2].ship_mode is None
    assert rows[3].ship_mode == "express"
    # plain read (no mergeSchema) picks ONE footer's schema — the helper
    # is what makes the evolved layout safe to consume
    assert len(merged.columns) >= len(spark.read.parquet(p).columns)


def test_bucketed_sidecar_bloom_prunes_point_lookups(spark, sf_dir, tmp_path):
    """Bucket + in-bucket sort + skipping sidecar in ONE layout pass
    (ROADMAP r5): equality probes prune through the bloom sidecar even
    though per-file min/max on a hash-bucketed layout spans the full
    domain. Pruned scans must stay row-exact vs the full-scan filter."""
    import os

    from pyspark.sql import functions as F

    from cdc_local_data_pipeline_docker_spark.sources.bucketed import (
        read_bucketed_pruned,
        write_bucketed,
    )
    from cdc_local_data_pipeline_docker_spark.sources.zorder import _STATS_FILE

    orders = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "ob_stats")
    write_bucketed(
        orders, "t_orders_sidecar", p, "o_custkey", 8,
        sort_cols=("o_orderdate",), stats_cols=("o_orderkey",),
    )
    meta_files = json.load(open(os.path.join(p, _STATS_FILE)))["files"]
    n_total = len(meta_files)
    assert n_total >= 8  # one+ file per bucket

    # point lookup on the HIGH-CARDINALITY stats column: the key lives in
    # one bucket, so the bloom keeps a strict subset of files
    key = orders.select("o_orderkey").first()[0]
    pruned = read_bucketed_pruned(spark, p, eq={"o_orderkey": key})
    kept = {os.path.basename(f) for f in pruned.inputFiles()}
    assert 0 < len(kept) < n_total
    got = pruned.where(F.col("o_orderkey") == key).collect()
    want = orders.where(F.col("o_orderkey") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # point lookup on the BUCKET key, path-read (no catalog metadata):
    # the sidecar recovers bucket-pruning economics for plain readers
    ck = orders.select("o_custkey").first()[0]
    pruned_b = read_bucketed_pruned(spark, p, eq={"o_custkey": ck})
    assert 0 < len(pruned_b.inputFiles()) < n_total
    got_b = pruned_b.where(F.col("o_custkey") == ck).count()
    assert got_b == orders.where(F.col("o_custkey") == ck).count()

    # absent key: bloom rejects every file (no false negatives -> safe;
    # at 4096 bits / ~190 distinct per file, false positives ~0)
    assert read_bucketed_pruned(spark, p, eq={"o_orderkey": -1}).count() == 0
    spark.sql("DROP TABLE IF EXISTS t_orders_sidecar")


def test_interchange_format_roundtrips(spark, sf_dir, tmp_path):
    """orders survives ORC/CSV/JSON round-trips bit-identically (explicit
    schema + microsecond timestamp format on the text formats)."""
    from cdc_local_data_pipeline_docker_spark.catalog import load_table
    from cdc_local_data_pipeline_docker_spark.sources.sinks import (
        INTERCHANGE_FORMATS,
        read_format,
        write_format,
    )

    src = load_table(spark, sf_dir, "orders")
    want = sorted(tuple(r) for r in src.collect())
    for fmt in INTERCHANGE_FORMATS:
        p = str(tmp_path / f"orders_{fmt}")
        write_format(src, p, fmt)
        back = read_format(spark, p, fmt, src.schema)
        assert back.schema == src.schema, fmt
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, f"{fmt} round-trip drift"
