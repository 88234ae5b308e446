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
    re-reading lineitem. Two-level mergeability is the entire point:
    partial sketches merge map-side within each group, and the group
    sketches merge again into the corpus-wide estimate, exactly how a
    100 TB pipeline maintains daily/global distincts from shard sketches."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(HLL_LGK)).alias("sk")
    )
    groups = per_group.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("approx_distinct_orders"),
    )
    merged = per_group.agg(
        F.hll_union_agg("sk").alias("sk")
    ).select(
        F.lit("ALL").alias("l_returnflag"),
        F.hll_sketch_estimate("sk").alias("approx_distinct_orders"),
    )
    return groups.unionByName(merged).orderBy("l_returnflag")


def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies over the document corpus estimated from ONE
    Count-Min-Sketch aggregate (fixed-size binary state, map-side merged),
    probed for the marker lexicon. The sketch crosses to the driver as a
    few KB regardless of corpus size; estimates are deterministic (seeded
    hash family) and overcount by at most eps·N with prob. ≥ confidence."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    blob = toks.agg(
        F.count_min_sketch(
            "tok", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(blob))
    rows = [(t, int(sk.estimateCount(t))) for t in CMS_PROBE_TOKENS]
    return spark.createDataFrame(
        rows, "token string, est_freq long"
    ).orderBy("token")
