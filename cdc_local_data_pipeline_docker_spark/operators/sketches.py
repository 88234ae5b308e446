"""Sketch operators: mergeable HLL distinct counts and Count-Min-Sketch
frequency estimation (ROADMAP item 3).

At 100 TB these REPLACE their exact counterparts: a sketch is fixed-size
state, computed with map-side partial aggregation and merged across
partitions/groups/days without rescanning — the property demonstrated
explicitly here by re-aggregating group sketches into a global one
(`hll_union_agg`), the same invariant that makes rollup tables safe for
counts and decimal sums (operators/advanced.events_rollup_reuse).

Approximate by construction → rows-only driver checks; pytest bounds the
estimation error against exact answers (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: HLL relative-error target (datasketches lgConfigK=12 default ≈ 1.6%).
HLL_LGK = 12

#: Count-Min-Sketch geometry: eps ≈ 2/width, confidence = 1 - 2^-depth.
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42

#: Probe set for the CMS frequency query: the language-marker lexicon
#: (known-present tokens with a wide frequency spread).
CMS_PROBE_TOKENS = (
    "the", "a", "table", "row", "data", "value", "join", "window",
    "stream", "key", "hash", "batch", "merge", "scan",
)


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct orders per returnflag via HLL sketches, PLUS a global
    'ALL' row obtained by UNIONING the per-group sketches — never
    re-reading lineitem for the estimate. Two-level mergeability is the
    entire point: partial sketches merge map-side within each group, and
    the group sketches merge again into the corpus-wide estimate, exactly
    how a 100 TB pipeline maintains daily/global distincts from shard
    sketches.

    Contract oracle (same pattern as agg_approx): each row carries the
    EXACT distinct count — identical in both engines — plus a boolean
    asserting this engine's OWN sketch estimate lands within 5% of its
    OWN exact value (lgK=12 ≈ 1.6% rsd, so the bound holds
    deterministically; DuckDB compares its own approx_count_distinct).
    The global exact needs one extra pass (per-flag exacts cannot merge:
    an order's lineitems can span flags) — the SKETCH path still proves
    merge-without-rescan."""
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx, ex):
        return F.abs(approx - ex) / ex <= F.lit(0.05)

    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(HLL_LGK)).alias("sk"),
        F.count_distinct("l_orderkey").alias("exact_distinct_orders"),
    )
    groups = per_group.select(
        "l_returnflag",
        "exact_distinct_orders",
        within(
            F.hll_sketch_estimate("sk").cast("double"),
            F.col("exact_distinct_orders").cast("double"),
        ).alias("within_5pct"),
    )
    merged = (
        per_group.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(
            F.broadcast(
                li.agg(
                    F.count_distinct("l_orderkey").alias("exact_distinct_orders")
                )
            )
        )
        .select(
            F.lit("ALL").alias("l_returnflag"),
            "exact_distinct_orders",
            within(
                F.hll_sketch_estimate("sk").cast("double"),
                F.col("exact_distinct_orders").cast("double"),
            ).alias("within_5pct"),
        )
    )
    return groups.unionByName(merged).orderBy("l_returnflag")


SKETCH_HLL_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_distinct_orders,
       ABS(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
           - CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE))
         / CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) <= 0.05 AS within_5pct
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'ALL',
       COUNT(DISTINCT l_orderkey),
       ABS(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
           - CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE))
         / CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) <= 0.05
FROM lineitem
ORDER BY l_returnflag
"""


def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies over the document corpus estimated from ONE
    Count-Min-Sketch aggregate (fixed-size binary state, map-side merged),
    probed for the marker lexicon. The sketch crosses to the driver as a
    few KB regardless of corpus size; estimates are deterministic (seeded
    hash family) and overcount by at most eps·N with prob. ≥ confidence.

    Contract oracle: each probe row carries the EXACT token frequency
    (identical in both engines) plus a boolean pinning the CMS guarantee
    against this engine's own exact values — exact ≤ estimate ≤ exact +
    eps·N (the oracle's boolean is literal TRUE: DuckDB has no CMS, its
    trivial 'sketch' is the exact count, which meets the bound by
    definition). ONE aggregation computes the sketch, the total token
    count, and all probe exacts in a single scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    row = toks.agg(
        F.count_min_sketch(
            "tok", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk"),
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum((F.col("tok") == t).cast("long")).alias(f"c{i}")
            for i, t in enumerate(CMS_PROBE_TOKENS)
        ],
    ).collect()[0]
    # Classic-mode only: the probe deserializes the sketch through the
    # driver JVM gateway (sparkContext._jvm), which Spark Connect does
    # not expose — under Connect, probe the blob with a small Python CMS
    # reader instead (same hash family; the serialized layout is stable).
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(row["sk"]))
    bound = CMS_EPS * row["n_total"]
    out = []
    for i, t in enumerate(CMS_PROBE_TOKENS):
        exact = int(row[f"c{i}"])
        est = int(sk.estimateCount(t))
        out.append((t, exact, exact <= est <= exact + bound))
    return spark.createDataFrame(
        out, "token string, exact_freq long, within_eps boolean"
    ).orderBy("token")


_CMS_PROBE_VALUES = ", ".join(f"('{t}')" for t in CMS_PROBE_TOKENS)

SKETCH_CMS_TOKEN_FREQ_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
probe(token) AS (VALUES {_CMS_PROBE_VALUES})
SELECT p.token,
       CAST((SELECT COUNT(*) FROM toks t WHERE t.tok = p.token) AS BIGINT)
         AS exact_freq,
       TRUE AS within_eps
FROM probe p
ORDER BY token
"""


# ---------------------------------------------------------------------------
# t-digest quantile sketch (ROADMAP item 3's applyInPandas leg).
# ---------------------------------------------------------------------------

#: t-digest compression: max centroids per digest. Rank error is
#: O(1/TDIGEST_COMPRESSION) near the median, tighter at the tails.
TDIGEST_COMPRESSION = 100

#: Shard count for the partial-digest stage.
TDIGEST_SHARDS = 32

#: Quantiles the headline query reports.
TDIGEST_QS = (0.5, 0.9, 0.99)


def _compress_centroids(means, weights, compression: int):
    """Merge (mean, weight) centroids, sorted by mean, into at most
    ``compression`` centroids using the t-digest size bound: a centroid
    may absorb its neighbor only while its weight stays under
    4 * n * q(1-q) / compression at its running quantile midpoint
    (Dunning & Ertl, 'Computing extremely accurate quantiles using
    t-digests', arXiv:1902.04023 — the k1 size function simplified)."""
    import numpy as np

    order = np.argsort(means, kind="mergesort")
    means, weights = np.asarray(means)[order], np.asarray(weights)[order]
    n = float(weights.sum())
    out_m, out_w = [], []
    cur_m, cur_w, seen = means[0], weights[0], 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (seen + cur_w / 2) / n
        cap = max(1.0, 4.0 * n * q * (1 - q) / TDIGEST_COMPRESSION)
        if cur_w + w <= cap and len(means) > compression:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            seen += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _digest_quantile(means, weights, q: float) -> float:
    """Quantile estimate by linear scan over cumulative centroid weight."""
    import numpy as np

    means, weights = np.asarray(means), np.asarray(weights)
    n = weights.sum()
    target = q * n
    cum = 0.0
    for m, w in zip(means, weights):
        if cum + w >= target:
            return float(m)
        cum += w
    return float(means[-1])


def _tdigest_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(quantile, estimate, n_centroids) via a two-level mergeable t-digest:
    shard rows by hash, build one partial digest per shard
    (applyInPandas, Arrow-batched), then merge the 32 shard digests into
    one and read the quantiles off it.

    This is the custom-mergeable-aggregate template: fixed-size partial
    state per shard (≤ compression centroids), one tiny merge stage —
    at 100 TB the shard digests are KBs regardless of input size, and
    daily digests merge into monthly ones without rescanning (same
    invariant as the HLL/CMS sketches above; the built-in twin is
    approx_percentile in agg_approx)."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem")
    sharded = li.select(
        # pmod, not %: Spark % keeps the sign, which would double the
        # shard space to (-S..S) and halve each partial digest's fill
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(TDIGEST_SHARDS))
        .alias("shard"),
        F.col("l_extendedprice").alias("x"),
    )

    def build_digest(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress_centroids(
            pdf["x"].to_numpy(),
            [1.0] * len(pdf),
            TDIGEST_COMPRESSION,
        )
        return pd.DataFrame(
            {"shard": pdf["shard"].iloc[0], "mean": m, "weight": w}
        )

    partials = sharded.groupBy("shard").applyInPandas(
        build_digest, "shard LONG, mean DOUBLE, weight DOUBLE"
    )

    def merge_digests(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress_centroids(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy(),
            TDIGEST_COMPRESSION,
        )
        return pd.DataFrame(
            {
                "quantile": list(TDIGEST_QS),
                "estimate": [_digest_quantile(m, w, q) for q in TDIGEST_QS],
                "n_centroids": len(m),
            }
        )

    return (
        partials.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            merge_digests, "quantile DOUBLE, estimate DOUBLE, n_centroids LONG"
        )
        .orderBy("quantile")
    )


def sketch_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract-oracle form of the t-digest sketch: for each requested
    quantile, a boolean asserting the digest estimate's TRUE RANK (share
    of rows <= estimate, computed with one extra scan against the 3-row
    broadcast digest) sits within 2% of the requested quantile.
    Estimate values are digest-implementation-specific, so the graded row
    carries the rank CONTRACT instead; DuckDB checks its own t-digest
    (approx_quantile) against its own ranks the same way. The raw
    (quantile, estimate, n_centroids) frame stays available to pytest via
    _tdigest_estimates."""
    dig = _tdigest_estimates(spark, sf_dir).select("quantile", "estimate")
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    ranks = (
        li.crossJoin(F.broadcast(dig))
        .groupBy("quantile")
        .agg(
            (
                F.sum((F.col("l_extendedprice") <= F.col("estimate")).cast("long"))
                / F.count(F.lit(1))
            ).alias("rank")
        )
    )
    return (
        ranks.select(
            "quantile",
            (F.abs(F.col("rank") - F.col("quantile")) <= 0.02).alias(
                "rank_within_2pct"
            ),
        )
        .orderBy("quantile")
    )


SKETCH_TDIGEST_QUANTILES_SQL = """
WITH est(quantile, e) AS (
  SELECT 0.5, approx_quantile(l_extendedprice, 0.5) FROM lineitem
  UNION ALL
  SELECT 0.9, approx_quantile(l_extendedprice, 0.9) FROM lineitem
  UNION ALL
  SELECT 0.99, approx_quantile(l_extendedprice, 0.99) FROM lineitem
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lineitem)
SELECT CAST(quantile AS DOUBLE) AS quantile,
       ABS(CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_extendedprice <= est.e) AS DOUBLE) / n.n
           - quantile) <= 0.02 AS rank_within_2pct
FROM est, n
ORDER BY quantile
"""
