"""Frequent-pattern mining + co-occurrence graph analytics.

Market-basket mining is the classic "what co-occurs?" pipeline: baskets
(orders) x items (part brands) -> frequent pairs with support and lift.
The implementation is the A-priori shape re-expressed declaratively:

  1. basket projection: distinct (basket, item) — one shuffle keyed on
     the pair, partial-aggregated map-side;
  2. frequent singles: item counts (vocabulary-bounded output, 25 brands
     here; at 100 TB the item vocabulary is still catalog-bounded, so
     this side BROADCASTS);
  3. candidate pairs: per-basket self-join (item_a < item_b) — the pair
     expansion is bounded by C(d, 2) per basket where d = distinct items
     per basket, NOT by |vocab|^2; the join key is the basket id, so the
     shuffle is one basket-keyed Exchange which AQE can also satisfy as
     a broadcast at small scale;
  4. support/lift from exact integer counts; the only doubles are the
     final ratios, computed with the IDENTICAL expression shape in both
     engines (bit-equal IEEE results).

`graph_triangle_count` then treats above-independence pairs (lift > 1)
as an undirected graph and counts per-node triangles + local clustering
coefficients with the DEGREE-ORDERED ORIENTATION algorithm: orient every
edge from its (degree, id)-smaller endpoint to the larger one, join
oriented wedges u->v->w with the oriented closing edge u->w. Each
triangle is produced exactly once, and the wedge count is bounded by
sum(out_degree^2) with out-degree <= O(sqrt(m)) — the standard bound
that makes triangle counting feasible at scale (vs the naive adjacency
cube). The DuckDB oracle uses the brute neighbor-pair form — same
per-node counts by construction, N^3-ish cost the 25-node vocabulary
graph tolerates.

No counterpart in the reference (its only aggregates are global counts,
kafka_to_s3_enhanced.py:195-199); this is EXT surface per SURVEY §2.D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: A pair is frequent when it appears in >= this fraction of baskets.
MIN_SUPPORT = 0.02


def _brand_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (basket=orderkey, item=brand) pairs. The part dim is
    catalog-sized -> broadcast; the distinct is one pair-keyed shuffle
    with map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .distinct()
    )


def _pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_a, item_b, pair_n, n_a, n_b, n_baskets) exact counts."""
    b = _brand_baskets(spark, sf_dir)
    nb = b.agg(F.countDistinct("ok").alias("n_baskets"))
    singles = b.groupBy("item").agg(F.count(F.lit(1)).alias("n1"))
    left = b.select(F.col("ok"), F.col("item").alias("item_a"))
    right = b.select(F.col("ok"), F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("item").alias("item_a"), F.col("n1").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(singles.select(F.col("item").alias("item_b"), F.col("n1").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
    )


def mine_brand_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand pairs (support >= MIN_SUPPORT of baskets) with
    support and lift. Lift > 1 means the brands co-occur more often than
    independence predicts — the association signal."""
    s = _pair_stats(spark, sf_dir)
    return (
        s.withColumn("support", F.col("pair_n").cast("double") / F.col("n_baskets"))
        .withColumn(
            "lift",
            F.col("pair_n").cast("double") * F.col("n_baskets")
            / (F.col("n_a") * F.col("n_b")),
        )
        .filter(F.col("support") >= F.lit(MIN_SUPPORT))
        .select(
            "item_a", "item_b", "pair_n", "n_a", "n_b", "n_baskets",
            "support", "lift",
        )
        .orderBy("item_a", "item_b")
    )


_BASKET_CTES = """
b AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM b),
singles AS (SELECT item, COUNT(*) AS n1 FROM b GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS pair_n
  FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item
  GROUP BY 1, 2
),
stats AS (
  SELECT item_a, item_b, pair_n, sa.n1 AS n_a, sb.n1 AS n_b,
         (SELECT n_baskets FROM nb) AS n_baskets
  FROM pairs
  JOIN singles sa ON item_a = sa.item
  JOIN singles sb ON item_b = sb.item
)
"""

MINE_BRAND_PAIR_LIFT_SQL = f"""
WITH {_BASKET_CTES}
SELECT item_a, item_b, pair_n, n_a, n_b, n_baskets,
       CAST(pair_n AS DOUBLE) / n_baskets AS support,
       CAST(pair_n AS DOUBLE) * n_baskets / (n_a * n_b) AS lift
FROM stats
WHERE CAST(pair_n AS DOUBLE) / n_baskets >= {MIN_SUPPORT}
ORDER BY item_a, item_b
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    lift>1 brand co-occurrence graph, by degree-ordered orientation.

    Orientation: edge {u, v} becomes u->v iff (deg(u), u) < (deg(v), v)
    — a total order, so every undirected edge appears exactly once in
    the oriented set and every triangle closes exactly once as
    (u->v, v->w, u->w). All three joins key on single node columns
    (shuffle- or broadcast-joinable); no adjacency is ever collected.
    """
    s = _pair_stats(spark, sf_dir)
    edges = s.filter(
        F.col("pair_n").cast("double") * F.col("n_baskets")
        / (F.col("n_a") * F.col("n_b"))
        > F.lit(1.0)
    ).select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))

    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))

    # attach degrees to both endpoints, then orient low -> high
    du = deg.select(F.col("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v"))
    ranked = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )

    wedge = (
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            "b",
        )
    )
    closing = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    triangles = wedge.join(closing, ["a", "c"])

    per_node = (
        triangles.select(
            F.explode(F.array("a", "b", "c")).alias("item")
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )

    return (
        deg.select(F.col("u").alias("item"), "deg")
        .join(per_node, "item", "left")
        .select(
            "item",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0)
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
        .orderBy("item")
    )


GRAPH_TRIANGLE_COUNT_SQL = f"""
WITH {_BASKET_CTES},
e AS (
  SELECT item_a AS u, item_b AS v FROM stats
  WHERE CAST(pair_n AS DOUBLE) * n_baskets / (n_a * n_b) > 1.0
),
adj AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u AS item, COUNT(*) AS deg FROM adj GROUP BY u),
tri AS (
  -- brute neighbor-pair form: node n's triangles = connected pairs of
  -- its neighbors (canonical x < y, so each counted once per node)
  SELECT a1.u AS item, COUNT(*) AS triangles
  FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
  JOIN e ON e.u = a1.v AND e.v = a2.v
  GROUP BY a1.u
)
SELECT d.item, d.deg AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.deg >= 2
            THEN 2.0 * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1))
            ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN tri t ON d.item = t.item
ORDER BY d.item
"""
