"""Incrementally-maintained ingest sketches: per-micro-batch merge of
mergeable summary state (VERDICT r3 item 5).

The batch sketch queries (operators/sketches.py) each rescan their input;
a live pipeline wants the running corpus summary WITHOUT rescanning
history — the same per-batch-cost argument as the latest-state upsert
(streaming/upsert.py) and the MinHash signature store
(llmops/incremental.py). This maintainer keeps, per CDC table, a
fixed-size sketch-state file updated per micro-batch:

  * ``hll``     — HLL sketch of the primary key (binary, lgK=12): running
                  approx-distinct-keys. Merge = ``hll_union`` — and
                  because HLL state is a per-register MAX, the merge is
                  idempotent under batch replay: re-unioning a replayed
                  batch cannot move the estimate (the exactly-once story
                  needs no dedup for this column).
  * ``means``/``weights`` — t-digest centroids of a numeric column
                  (orders.total_amount by default): running quantiles.
                  Batch centroids come from the same distributed
                  shard-partial path as the batch query
                  (sketches._compress_centroids); merging into the stored
                  digest happens driver-side on ≤ 2·compression centroids.
  * ``n``       — exact row count (the U8 verification counter).

State is KBs regardless of history size — the property that lets shard /
daily sketches roll into global ones at 100 TB without rescans. The state
file swap reuses the upsert maintainer's crash-recovery rename dance
(``upsert._recover_state``): a crash mid-swap restores the previous
snapshot and the replayed batch re-merges (HLL idempotent; digest/count
replay-safe because the source offset commit happens AFTER the batch
function returns, so a committed batch never replays).

Batch-boundary invariance (pytest-pinned): replaying the event log in any
chunking yields the identical HLL estimate and row count, and a digest
whose quantile estimates satisfy the same rank contract as the one-shot
digest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc import parse as P
from ..operators.sketches import (
    HLL_LGK,
    TDIGEST_COMPRESSION,
    TDIGEST_QS,
    TDIGEST_SHARDS,
    _compress_centroids,
    _digest_quantile,
)
from .upsert import _recover_state, _swap

#: Default numeric column summarized by the running t-digest, per table.
SKETCH_VALUE_COLS = {"orders": "total_amount"}

#: Count-Min-Sketch geometry for the running per-key update-frequency
#: sketch (hot-key detection over the CDC stream). eps*N overcount bound;
#: fixed seed so two-batch replay merges to the IDENTICAL counter arrays
#: as a one-shot pass (CMS merge is elementwise addition — exact).
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42

_STATE_DDL = (
    "hll BINARY, cms BINARY, means ARRAY<DOUBLE>, weights ARRAY<DOUBLE>, "
    "n LONG, last_batch_id LONG"
)


def _cms_merge(spark: SparkSession, a: bytes | None, b: bytes | None) -> bytes | None:
    """Merge two serialized CountMinSketch states via the JVM sketch
    library (classic mode; counter arrays add elementwise — exact). The
    blobs are ~100 KB: driver-side merge is the right cost model, the
    same shape as the HLL union and digest merge above. Either side may
    be None (an aggregate over an empty/tombstone-only batch returns
    NULL sketches): the non-null side passes through."""
    if a is None:
        return bytes(b) if b is not None else None
    if b is None:
        return bytes(a)
    jvm = spark.sparkContext._jvm
    CMS = jvm.org.apache.spark.util.sketch.CountMinSketch
    sk = CMS.readFrom(bytes(a))
    sk.mergeInPlace(CMS.readFrom(bytes(b)))
    out = jvm.java.io.ByteArrayOutputStream()
    sk.writeTo(out)
    return bytes(out.toByteArray())


def _hll_union(spark: SparkSession, a: bytes | None, b: bytes | None) -> bytes | None:
    """hll_union over two binary HLL states; None on either side (empty
    batch) passes the non-null sketch through, matching _cms_merge."""
    if a is None:
        return bytes(b) if b is not None else None
    if b is None:
        return bytes(a)
    pair = spark.createDataFrame([(bytes(a), bytes(b))], "a BINARY, b BINARY")
    return pair.select(F.hll_union("a", "b", True).alias("u")).collect()[0]["u"]


def sketch_state_path(out_dir: str, table: str) -> str:
    return os.path.join(out_dir, f"{table}_sketch_state")


def _batch_centroids(delta: DataFrame, value_col: str):
    """Distributed partial digests for one batch: shard rows by hash,
    compress per shard (applyInPandas), collect only the ≤ shards ×
    compression centroid rows."""
    import pandas as pd

    vals = delta.select(
        F.pmod(F.xxhash64("pk", "kafka_offset"), F.lit(TDIGEST_SHARDS)).alias(
            "shard"
        ),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress_centroids(
            pdf["x"].to_numpy(), [1.0] * len(pdf), TDIGEST_COMPRESSION
        )
        return pd.DataFrame({"mean": m, "weight": w})

    rows = (
        vals.groupBy("shard")
        .applyInPandas(build, "mean DOUBLE, weight DOUBLE")
        .collect()
    )
    return [r["mean"] for r in rows], [r["weight"] for r in rows]


def merge_batch_sketches(
    spark: SparkSession,
    batch_env: DataFrame,
    table: str,
    out_dir: str,
    batch_id: int = 0,
    value_col: str | None = None,
) -> None:
    """One incremental step: fold a micro-batch of envelope rows into the
    stored sketch state (HLL union ∪ digest merge ∪ count add).

    Idempotent under batch replay (ADVICE r4): the state row stores the
    last-applied ``batch_id``; foreachBatch ids are monotonically
    increasing, so a replayed batch (crash between the state-dir swap and
    the streaming commit-log write) arrives with ``batch_id <=
    last_batch_id`` and is skipped. Without this, HLL would be safe
    (per-register max) but the exact counter, CMS arrays, and digest
    centroids are additive and would double-count."""
    import shutil

    value_col = value_col or SKETCH_VALUE_COLS.get(table, "kafka_offset")
    path = sketch_state_path(out_dir, table)
    _recover_state(path)
    prior = None
    if os.path.exists(path):
        prior = spark.read.parquet(path).collect()[0]
        last = prior.asDict().get("last_batch_id")
        if last is not None and batch_id <= last:
            return  # already applied — the standard foreachBatch no-op

    delta = P.project_changelog(P.parse_events(batch_env, table), table).filter(
        ~F.col("is_malformed") & ~F.col("is_tombstone")
    )
    agg = delta.agg(
        F.hll_sketch_agg("pk", F.lit(HLL_LGK)).alias("hll"),
        F.count_min_sketch(
            F.col("pk").cast("string"),
            F.lit(CMS_EPS),
            F.lit(CMS_CONFIDENCE),
            F.lit(CMS_SEED),
        ).alias("cms"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    b_means, b_weights = _batch_centroids(delta, value_col)

    if prior is not None:
        s = prior
        means = list(s["means"]) + b_means
        weights = list(s["weights"]) + b_weights
        n = s["n"] + agg["n"]
        hll = _hll_union(spark, s["hll"], agg["hll"])
        cms = _cms_merge(spark, s["cms"], agg["cms"])
    else:
        means, weights, n = b_means, b_weights, agg["n"]
        hll, cms = agg["hll"], agg["cms"]

    if means:
        means, weights = _compress_centroids(means, weights, TDIGEST_COMPRESSION)
    means = [float(x) for x in means]  # numpy scalars -> plain doubles
    weights = [float(x) for x in weights]
    state = spark.createDataFrame(
        [
            (
                bytes(hll) if hll is not None else None,
                bytes(cms) if cms is not None else None,
                means,
                weights,
                n,
                int(batch_id),
            )
        ],
        _STATE_DDL,
    ).coalesce(1)

    _swap(state, path, batch_id)  # shared crash-recoverable rename dance


def start_sketch_stream(
    spark: SparkSession,
    event_dir: str,
    table: str,
    out_dir: str,
    value_col: str | None = None,
):
    """Drain available change events for ``table``, maintaining the sketch
    state per micro-batch (AvailableNow; checkpointed like the upsert)."""
    env = spark.readStream.schema(P.ENVELOPE_DDL).json(
        os.path.join(event_dir, f"{table}*.jsonl")
    )
    q = (
        env.writeStream.foreachBatch(
            lambda df, bid: merge_batch_sketches(
                df.sparkSession, df, table, out_dir, bid, value_col
            )
        )
        .option(
            "checkpointLocation",
            os.path.join(out_dir, "_checkpoints_sketch", table),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def cdc_ingest_sketch_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry adapter + contract oracle for the incremental sketch
    maintainer: replay the seeded orders change stream in TWO offset-split
    batches (exercising the merge path), then emit one row of exact values
    both engines can compute — live-row count and exact distinct keys —
    plus booleans the oracle pins TRUE:

      * ``count_matches``    — the maintained exact counter equals the
                               changelog's true live-row count,
      * ``hll_within_5pct``  — the merged HLL estimate lands within 5% of
                               the true distinct-key count (lgK=12 rsd
                               ≈1.6%; deterministic fixtures),
      * ``p50_rank_ok``      — the merged digest's median estimate has
                               true rank within 0.1 of 0.5 over the
                               total_amount values.

    sf_dir is unused (CDC input is the fixture stream); kept for the
    uniform queries() signature."""
    import shutil
    import tempfile

    from ..cdc.queries import ensure_fixtures

    d = ensure_fixtures()
    env = P.read_event_file(spark, os.path.join(d, "orders.jsonl"))
    mid = env.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
    out = tempfile.mkdtemp(prefix="cdc_sketch_state_")
    try:
        merge_batch_sketches(spark, env.filter(F.col("offset") <= mid), "orders", out, 0)
        merge_batch_sketches(spark, env.filter(F.col("offset") > mid), "orders", out, 1)
        s = read_sketch_summary(spark, out, "orders").collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)

    live = P.project_changelog(P.parse_events(env, "orders"), "orders").filter(
        ~F.col("is_malformed") & ~F.col("is_tombstone")
    )
    # The median's true rank as a filter-count ratio — one distributed
    # aggregate, no corpus-sized collect (VERDICT r4 "What's wrong #1"):
    # at any table size this moves two longs to the driver, not N values.
    ex = live.select(
        F.col("total_amount").cast("double").alias("v"), "pk"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("pk").alias("nd"),
        F.count("v").alias("n_vals"),
        F.count(F.when(F.col("v") <= float(s["p50"]), 1)).alias("n_le_p50"),
    ).collect()[0]
    rank = ex["n_le_p50"] / ex["n_vals"]
    return spark.createDataFrame(
        [
            (
                int(ex["n"]),
                int(ex["nd"]),
                bool(s["n_rows"] == ex["n"]),
                bool(abs(s["approx_distinct_keys"] - ex["nd"]) <= 0.05 * ex["nd"]),
                bool(abs(rank - 0.5) <= 0.1),
            )
        ],
        "n_rows LONG, n_distinct_keys LONG, count_matches BOOLEAN, "
        "hll_within_5pct BOOLEAN, p50_rank_ok BOOLEAN",
    )


def _sketch_summary_sql() -> str:
    from ..cdc.queries import FIXTURE_DIR

    return f"""
WITH env AS (
  SELECT *,
         CASE WHEN value IS NOT NULL AND json_valid(value) THEN value END AS v
  FROM read_json_auto('{FIXTURE_DIR}/orders.jsonl',
                      format='newline_delimited')
),
live AS (
  SELECT CAST(json_extract_string(key, '$.order_id') AS INT) AS pk
  FROM env
  WHERE value IS NOT NULL
    AND json_extract_string(v, '$.order_id') IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       COUNT(DISTINCT pk) AS n_distinct_keys,
       TRUE AS count_matches,
       TRUE AS hll_within_5pct,
       TRUE AS p50_rank_ok
FROM live
"""


CDC_INGEST_SKETCH_SUMMARY_SQL = _sketch_summary_sql()


def cdc_hotkey_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry adapter + contract oracle for the CMS hot-key monitor
    (VERDICT r4 item 6): replay the seeded orders change stream in two
    offset-split batches into a fresh sketch state (merge path
    exercised), probe the five hottest keys through the maintained CMS,
    and emit per key the EXACT update count both engines compute plus a
    ``within_eps_n`` boolean the oracle pins TRUE — the CMS guarantee
    exact <= estimate <= exact + eps*N (eps=0.001, confidence 0.99;
    deterministic seed, so the boolean is reproducible, not flaky).

    Hot keys are the top 5 by (update count DESC, pk ASC) — a
    deterministic tie-break so Spark and DuckDB pick identical keys.
    sf_dir is unused (CDC input is the fixture stream)."""
    import shutil
    import tempfile

    from ..cdc.queries import ensure_fixtures

    d = ensure_fixtures()
    env = P.read_event_file(spark, os.path.join(d, "orders.jsonl"))
    mid = env.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
    out = tempfile.mkdtemp(prefix="cdc_hotkey_state_")
    try:
        merge_batch_sketches(spark, env.filter(F.col("offset") <= mid), "orders", out, 0)
        merge_batch_sketches(spark, env.filter(F.col("offset") > mid), "orders", out, 1)

        live = P.project_changelog(P.parse_events(env, "orders"), "orders").filter(
            ~F.col("is_malformed") & ~F.col("is_tombstone")
        )
        per_key = live.groupBy("pk").agg(F.count(F.lit(1)).alias("n_updates"))
        n_total = live.count()
        hot = per_key.orderBy(F.desc("n_updates"), F.asc("pk")).limit(5).collect()
        est = probe_key_frequency(
            spark, out, "orders", [str(r["pk"]) for r in hot]
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    eps_n = CMS_EPS * n_total
    return spark.createDataFrame(
        [
            (
                int(r["pk"]),
                int(r["n_updates"]),
                bool(
                    r["n_updates"]
                    <= est[str(r["pk"])]
                    <= r["n_updates"] + eps_n + 1
                ),
            )
            for r in hot
        ],
        "pk LONG, n_updates LONG, within_eps_n BOOLEAN",
    ).orderBy(F.desc("n_updates"), F.asc("pk"))


def _hotkey_monitor_sql() -> str:
    from ..cdc.queries import FIXTURE_DIR

    return f"""
WITH env AS (
  SELECT *,
         CASE WHEN value IS NOT NULL AND json_valid(value) THEN value END AS v
  FROM read_json_auto('{FIXTURE_DIR}/orders.jsonl',
                      format='newline_delimited')
),
live AS (
  SELECT CAST(json_extract_string(key, '$.order_id') AS BIGINT) AS pk
  FROM env
  WHERE value IS NOT NULL
    AND json_extract_string(v, '$.order_id') IS NOT NULL
)
SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_updates, TRUE AS within_eps_n
FROM live
GROUP BY pk
ORDER BY n_updates DESC, pk ASC
LIMIT 5
"""


CDC_HOTKEY_MONITOR_SQL = _hotkey_monitor_sql()


def probe_key_frequency(
    spark: SparkSession, out_dir: str, table: str, keys: list[str]
) -> dict[str, int]:
    """Estimated update count per key from the maintained CMS — the
    hot-key monitor: exact_count <= estimate <= exact_count + eps*N with
    probability >= confidence, over the whole ingest history, answered
    from ~100 KB of state without rescanning the changelog."""
    s = spark.read.parquet(sketch_state_path(out_dir, table)).collect()[0]
    if s["cms"] is None:  # state written from empty batches only
        return {k: 0 for k in keys}
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(s["cms"])
    )
    return {k: int(sk.estimateCount(k)) for k in keys}


def read_sketch_summary(
    spark: SparkSession, out_dir: str, table: str
) -> DataFrame:
    """The maintained summary as one row: exact row count, HLL
    approx-distinct keys, and the digest's quantile estimates."""
    s = spark.read.parquet(sketch_state_path(out_dir, table)).collect()[0]
    if s["hll"] is None:  # state written from empty batches only
        est = 0
    else:
        est = spark.createDataFrame(
            [(bytes(s["hll"]),)], "hll BINARY"
        ).select(F.hll_sketch_estimate("hll").alias("e")).collect()[0]["e"]
    qs = {
        f"p{int(q * 100)}": (
            _digest_quantile(list(s["means"]), list(s["weights"]), q)
            if s["means"]
            else None  # state built from empty batches: no values yet
        )
        for q in TDIGEST_QS
    }
    return spark.createDataFrame(
        [(s["n"], int(est), qs["p50"], qs["p90"], qs["p99"])],
        "n_rows LONG, approx_distinct_keys LONG, p50 DOUBLE, p90 DOUBLE, "
        "p99 DOUBLE",
    )
