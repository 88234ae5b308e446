"""Entity resolution: blocked fuzzy matching over structured records.

Record linkage is the structured-data sibling of the llmops dedup family:
instead of near-duplicate *documents*, find candidate-duplicate *entities*
(customers here) whose identifying attributes almost agree. The canonical
production shape (Fellegi-Sunter / dedupe-style pipelines) is

  1. BLOCKING — a cheap deterministic key (phonetic code, prefix,
     geography) partitions records so only same-block pairs are compared.
     This is what makes ER feasible at all: the pair space drops from
     N^2/2 to sum_b n_b^2/2, bounded by the largest block.
  2. PAIRWISE VERIFY — an exact similarity (edit distance here) runs on
     the surviving candidates only, map-side after the block equi-join.
  3. RESOLUTION — pick each record's best match (min distance, tie ->
     lowest key) to drive a merge/survivorship decision.

Scale design (100 TB): the blocking join is a plain equi-join on the
block key — Catalyst shuffles both sides by block, AQE handles block-size
skew, and the levenshtein verify runs inside the join's filter (JVM
codegen, no Python). The pair space never materializes beyond one block's
cross product, so the binding constraint is max block size: at real scale
the block key must be high-cardinality (e.g. phonetic(last_name) + zip3,
composite multi-pass blocking); the TPC-H fixture blocks on
(c_nationkey, c_mktsegment) which bounds blocks to ~N/125 — same plan
shape, toy key. Resolution is one window over the candidate pairs (tiny
relative to the corpus).

Both engines implement textbook unit-cost Levenshtein (Spark
`F.levenshtein`, DuckDB `levenshtein`), so the whole pipeline is
hash-graded exactly — no contract bounds needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: verify threshold: candidate pairs with edit distance above this are
#: not entity-match candidates (TPC-H names differ only in key digits,
#: so 2 keeps the result non-trivial at every sf without exploding it)
ER_MAX_EDIT_DISTANCE = 2


def _candidate_pairs(c: DataFrame) -> DataFrame:
    """Blocked candidate pairs with edit distance, a < b de-duplicated."""
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("blk_nation"),
        F.col("c_mktsegment").alias("blk_segment"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("blk_nation"),
        F.col("c_mktsegment").alias("blk_segment"),
    )
    return (
        a.join(b, ["blk_nation", "blk_segment"])
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= ER_MAX_EDIT_DISTANCE)
    )


def er_blocked_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All candidate entity-match pairs: same block, edit distance <= 2.

    The equi-join on the block key is the ONLY shuffle; the levenshtein
    verify and threshold run in the join's residual filter (codegen,
    map-side). Output is the audit-friendly pair list."""
    c = load_table(spark, sf_dir, "customer")
    return (
        _candidate_pairs(c)
        .select(
            "custkey_a", "custkey_b", "name_a", "name_b",
            "blk_nation", "blk_segment", "edit_distance",
        )
        .orderBy("custkey_a", "custkey_b")
    )


ER_BLOCKED_FUZZY_MATCH_SQL = f"""
SELECT a.c_custkey AS custkey_a,
       b.c_custkey AS custkey_b,
       a.c_name AS name_a,
       b.c_name AS name_b,
       a.c_nationkey AS blk_nation,
       a.c_mktsegment AS blk_segment,
       levenshtein(a.c_name, b.c_name) AS edit_distance
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_EDIT_DISTANCE}
ORDER BY custkey_a, custkey_b
"""


def er_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution step: each record's single best match among its
    candidates — min edit distance, ties to the lowest partner key.

    Pairs are symmetrized first (a record can be the b-side of its best
    candidate); the window runs over the candidate set only, which is
    orders of magnitude smaller than the corpus."""
    c = load_table(spark, sf_dir, "customer")
    pairs = _candidate_pairs(c)
    sym = pairs.select(
        F.col("custkey_a").alias("custkey"),
        F.col("custkey_b").alias("match_custkey"),
        "edit_distance",
    ).unionByName(
        pairs.select(
            F.col("custkey_b").alias("custkey"),
            F.col("custkey_a").alias("match_custkey"),
            "edit_distance",
        )
    )
    w = Window.partitionBy("custkey").orderBy("edit_distance", "match_custkey")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("custkey", "match_custkey", "edit_distance")
        .orderBy("custkey")
    )


ER_BEST_MATCH_SQL = f"""
WITH pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
         levenshtein(a.c_name, b.c_name) AS edit_distance
  FROM customer a
  JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_EDIT_DISTANCE}
),
sym AS (
  SELECT custkey_a AS custkey, custkey_b AS match_custkey, edit_distance
  FROM pairs
  UNION ALL
  SELECT custkey_b AS custkey, custkey_a AS match_custkey, edit_distance
  FROM pairs
)
SELECT custkey, match_custkey, edit_distance
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY custkey
           ORDER BY edit_distance, match_custkey) AS rn
  FROM sym)
WHERE rn = 1
ORDER BY custkey
"""


def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline: blocked candidates ->
    levenshtein verify -> connected components (match pairs are a graph;
    an entity is a component) -> survivorship (golden record): one row
    per resolved entity carrying the canonical member (the component's
    minimum key — which IS the hash-min cluster label), the member
    count, and a merge rule over attributes (max account balance — the
    'keep richest' survivorship rule).

    Scale: reuses the dedup family's CC machinery (hash-min label
    propagation, one key-equi-join shuffle per round, star-contraction
    fallback). The match graph is match-pair-sized — usually far smaller
    than the record corpus but data-dependent — so the labels join rides
    the size-gated broadcast (counted <= DROP_SET_BROADCAST_MAX_ROWS ->
    hint, else shuffle join; VERDICT r7 #1). The survivor name needs no
    second join at all: the hash-min cluster label IS the minimum member
    key, so ``min_by(c_name, c_custkey)`` inside the one aggregation
    yields the canonical member's name — one join, one shuffle, no
    unconditional broadcast of the customer dim."""
    from ..llmops.clusters import connected_components
    from ..llmops.dedup import gated_broadcast
    from ..plans.cache_scope import scoped_persist

    c = load_table(spark, sf_dir, "customer")
    # CC probes its edge input several times (local-finish probe +
    # propagation rounds): persist the verified pairs so the block join
    # + levenshtein verify run once, not per probe
    pairs = scoped_persist(
        _candidate_pairs(c).select(
            F.col("custkey_a").alias("doc_a"), F.col("custkey_b").alias("doc_b")
        )
    )
    cc = connected_components(pairs)
    members = cc.select(F.col("id").alias("c_custkey"), "cluster_id")
    return (
        c.join(gated_broadcast(members), "c_custkey")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min_by("c_name", "c_custkey").alias("survivor_name"),
            F.max(F.col("c_acctbal")).cast("double").alias("max_acctbal"),
        )
        .select("cluster_id", "n_members", "survivor_name", "max_acctbal")
        .orderBy("cluster_id")
    )


def _golden_sql() -> str:
    from ..llmops.clusters import _CC_SQL_TEMPLATE

    pairs = f"""
  SELECT a.c_custkey AS doc_a, b.c_custkey AS doc_b
  FROM customer a
  JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_EDIT_DISTANCE}
"""
    return (
        _CC_SQL_TEMPLATE.format(pairs=pairs)
        + """
SELECT l.cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       s.c_name AS survivor_name,
       CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_acctbal
FROM lbl l
JOIN customer c ON l.doc_id = c.c_custkey
JOIN customer s ON s.c_custkey = l.cluster_id
GROUP BY l.cluster_id, s.c_name
ORDER BY cluster_id
"""
    )


ER_GOLDEN_RECORD_SQL = _golden_sql()
