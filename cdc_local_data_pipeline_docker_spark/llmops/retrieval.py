"""Ranked full-text retrieval over the `documents` corpus: BM25-style
scoring through an inverted-index posting join, and reciprocal-rank-fusion
(RRF) hybrid retrieval — the query side of a training-data / RAG pipeline
(the reference pipeline stops at ingest; retrieval is the natural read
path its corpus consumers run).

Cross-engine exactness model (README): no transcendentals in
oracle-compared values. Classic BM25 idf is `log((N-df+.5)/(df+.5))`;
log()'s last ulp differs across libms, so we keep the idf as the exact
RATIONAL `(N-df+.5)/(df+.5)` — the same family as text.py's log-free
TF-IDF — and every double in the score is produced by a fixed expression
tree of correctly-rounded ops (one division per factor, no reassociation).
The per-term score is then FLOORed into integer micro-units and summed as
BIGINT, so the (query, doc) total is independent of aggregation order —
the float-summation-order trap that breaks naive cross-engine scoring.

Scale design (100 TB corpus): the corpus appears only as posting lists
keyed by (token, doc_id) — the same tf/df/dl aggregates an inverted index
materializes once and reuses across queries. The query set broadcasts
(KB); df and corpus stats ride token-keyed / 1-row broadcasts; the only
corpus-sized shuffles are the two token-keyed aggregations. Per-query
candidate sets are bounded by posting-list size, and the final top-k is a
per-query window (window_topk_salted is the drop-in for a hot query whose
postings skew a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: The benchmark query set: (query_id, query text). Terms come from the
#: corpus vocabulary; tokenization is the corpus convention (single-space
#: split, text.py).
QUERIES = (
    (1, "spark stream window"),
    (2, "hash join merge sort"),
    (3, "slow query scan"),
    (4, "customer order data batch"),
)

#: BM25 shape parameters (Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: Fixed-point scale: per-term scores floor into 1e-6 units.
SCORE_SCALE = 1_000_000

#: Results returned per query.
TOP_K = 10

#: Candidate depth each ranker feeds into the RRF fusion.
RRF_DEPTH = 20

#: RRF dampening constant (Cormack et al.'s k=60).
RRF_K = 60


def _postings(spark: SparkSession, sf_dir: str):
    """Shared inverted-index frames: tf per (doc, token), df per token,
    dl per doc, and the 1-row corpus stats (N, avgdl)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).join(
        dl.agg(F.sum("dl").alias("sum_dl")), how="cross"
    )
    return tf, dl, df, stats


def _query_terms(spark: SparkSession):
    """Distinct (query_id, token) pairs — BM25 sums DISTINCT query terms."""
    q = spark.createDataFrame(list(QUERIES), "query_id INT, query_text STRING")
    return q.select(
        "query_id", F.explode(F.split("query_text", " ")).alias("token")
    ).distinct()


def scored_matches_from_index(spark: SparkSession, tf, dl, df, stats):
    """(query_id, doc_id, score_fp, n_terms_matched, dl): the BM25 join,
    over ANY materialization of the inverted-index frames — the corpus
    build (`_postings`) or an incrementally-maintained index
    (streaming/incremental_postings.py), which MUST score identically.

    The whole score is ONE fixed expression tree per (query, doc, term):
      idf_r  = (2*(N-df)+1) / (2*df+1)            -- exact ints, 1 division
      tfsat  = tf*(K1+1) / (tf + K1*((1-B) + B*dl/avgdl))
      fp     = floor(idf_r * tfsat * SCALE)        -- exact BIGINT
    then SUM(fp) as BIGINT — aggregation-order-independent."""
    qt = _query_terms(spark)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf_r = ((F.lit(2) * (F.col("n_docs") - F.col("df")) + F.lit(1)).cast(
        "double"
    )) / (F.lit(2) * F.col("df") + F.lit(1))
    tfsat = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
    )
    per_term = (
        tf.join(F.broadcast(qt), "token")
        .join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "dl",
            F.floor(idf_r * tfsat * F.lit(SCORE_SCALE))
            .cast("bigint")
            .alias("fp"),
        )
    )
    return per_term.groupBy("query_id", "doc_id").agg(
        F.sum("fp").alias("score_fp"),
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.first("dl").alias("dl"),
    )


def _scored_matches(spark: SparkSession, sf_dir: str):
    tf, dl, df, stats = _postings(spark, sf_dir)
    return scored_matches_from_index(spark, tf, dl, df, stats)


def topk_from_scored(scored) -> DataFrame:
    """The shared per-query top-{TOP_K} ranking over a scored frame."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "score_fp", "n_terms_matched")
        .orderBy("query_id", "rank")
    )


def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} documents per benchmark query under fixed-point
    rational-idf BM25; ties break on doc_id. Columns: query_id, rank,
    doc_id, score_fp (1e-6 units), n_terms_matched."""
    return topk_from_scored(_scored_matches(spark, sf_dir))


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers per query:

    - ranker A: the BM25 fixed-point score (rank by score_fp desc);
    - ranker B: lexical coverage (distinct query terms matched desc,
      shorter doc first) — the cheap boolean-retrieval baseline BM25 is
      usually fused against when no embedding model is in the loop.

    rrf = 1/(K+rank_a) + 1/(K+rank_b), absent ranker contributes 0.
    Each term is one correctly-rounded division and the sum is a single
    fixed-order addition, so the double is bit-identical cross-engine
    (no aggregation-order dependence — the RRF trap with >2 rankers is
    documented here: sum fixed-point, as BM25 does, if fusing many).
    Output: query_id, rank, doc_id, rank_bm25, rank_cov, rrf_fp.

    rrf is floored into 1e-9 units for the graded column; ordering uses
    the same integer. Scale: both rankers' candidate sets are bounded by
    RRF_DEPTH per query before the join, so fusion is a k×k-bounded
    per-query merge — driver-independent, broadcast-free."""
    scored = _scored_matches(spark, sf_dir)
    w_a = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    w_b = Window.partitionBy("query_id").orderBy(
        F.col("n_terms_matched").desc(), F.col("dl").asc(), F.col("doc_id").asc()
    )
    a = (
        scored.withColumn("rank_bm25", F.row_number().over(w_a))
        .filter(F.col("rank_bm25") <= RRF_DEPTH)
        .select("query_id", "doc_id", "rank_bm25")
    )
    b = (
        scored.withColumn("rank_cov", F.row_number().over(w_b))
        .filter(F.col("rank_cov") <= RRF_DEPTH)
        .select("query_id", "doc_id", "rank_cov")
    )
    rrf = (
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_bm25")), F.lit(0.0)
        )
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_cov")), F.lit(0.0))
    )
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "rank_bm25",
        "rank_cov",
        F.floor(rrf * F.lit(1_000_000_000)).cast("bigint").alias("rrf_fp"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_fp").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "rank_bm25", "rank_cov", "rrf_fp")
        .orderBy("query_id", "rank")
    )


_QUERY_VALUES = ", ".join(f"({qid}, '{text}')" for qid, text in QUERIES)

_POSTINGS_CTE = f"""
qt AS (
  SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS token
  FROM (VALUES {_QUERY_VALUES}) AS q(query_id, query_text)
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
),
dfc AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dl) AS sum_dl
),
per_term AS (
  SELECT qt.query_id, tf.doc_id, dl.dl,
         CAST(FLOOR(
           (CAST(2 * (n_docs - df) + 1 AS DOUBLE) / (2 * df + 1))
           * ((tf * {BM25_K1 + 1.0}) /
              (tf + {BM25_K1} * ({1.0 - BM25_B} +
                                 {BM25_B} * dl /
                                 (CAST(sum_dl AS DOUBLE) / n_docs))))
           * {SCORE_SCALE}) AS BIGINT) AS fp
  FROM tf
  JOIN qt USING (token)
  JOIN dfc USING (token)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT query_id, doc_id, CAST(SUM(fp) AS BIGINT) AS score_fp,
         COUNT(*) AS n_terms_matched, MIN(dl) AS dl
  FROM per_term GROUP BY query_id, doc_id
)"""

SEARCH_BM25_TOPK_SQL = f"""
WITH {_POSTINGS_CTE},
ranked AS (
  SELECT query_id, doc_id, score_fp, n_terms_matched,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_fp DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score_fp, n_terms_matched
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""

SEARCH_HYBRID_RRF_SQL = f"""
WITH {_POSTINGS_CTE},
a AS (
  SELECT query_id, doc_id, rank_bm25 FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_fp DESC, doc_id ASC) AS rank_bm25
    FROM scored
  ) WHERE rank_bm25 <= {RRF_DEPTH}
),
b AS (
  SELECT query_id, doc_id, rank_cov FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY n_terms_matched DESC, dl ASC,
                                       doc_id ASC) AS rank_cov
    FROM scored
  ) WHERE rank_cov <= {RRF_DEPTH}
),
fused AS (
  SELECT query_id, doc_id, rank_bm25, rank_cov,
         CAST(FLOOR(
           (COALESCE(1.0 / ({RRF_K} + rank_bm25), 0.0)
            + COALESCE(1.0 / ({RRF_K} + rank_cov), 0.0))
           * 1000000000) AS BIGINT) AS rrf_fp
  FROM a FULL OUTER JOIN b USING (query_id, doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_fp DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT query_id, rank, doc_id, rank_bm25, rank_cov, rrf_fp
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""
