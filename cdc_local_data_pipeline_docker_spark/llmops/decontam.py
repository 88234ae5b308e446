"""Benchmark decontamination and deterministic corpus splitting — the
eval-hygiene leg of a training-data pipeline (no reference counterpart;
SURVEY.md §2.C LLM-ops extension).

Before training, every serious pipeline (a) removes documents that leak
the evaluation benchmarks (n-gram collision decontamination — the
standard method popularized by GPT-3/PaLM appendix hygiene sections) and
(b) carves deterministic train/val/test splits that are stable across
reruns and machines. Both are exact, oracle-checkable relational plans:

  * decontamination — the benchmark side is SMALL (eval suites are KBs
    to MBs), so its distinct-shingle posting list BROADCASTS and the
    corpus-side scan stays shuffle-free: a map-side semi-join-with-count
    at any corpus size. Shingles ride the same 8-byte xxhash64 longs as
    the dedup family (llmops/dedup._hashed_shingle_arrays).
  * splits — assignment is a pure function of content-stable identity
    (md5 of the key), so it is reproducible on any cluster layout, and
    the stratified sampler is a per-group smallest-k by hash: a window
    top-k, not a shuffle-the-world ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import _SHINGLED_SQL, _hashed_shingle_arrays

#: Every BENCH_MOD-th document plays the held-out benchmark/eval set.
BENCH_MOD = 20

#: Deterministic per-language sample size (smallest-k by md5).
STRATIFIED_K = 5

#: Split fractions over the 16 md5 first-hex-char buckets: 12/2/2.
SPLIT_TRAIN_BUCKETS = 12
SPLIT_VAL_BUCKETS = 2


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that collide with the benchmark set on ≥1 word-3-gram
    shingle, with the distinct-collision count — the rows a pipeline
    would drop (or flag) before training.

    Plan shape for 100 TB: the benchmark's distinct hashed shingles are
    broadcast (eval sets are tiny by construction); the corpus side
    explodes its per-doc shingle hashes map-side, the broadcast hash join
    filters them, and one partial-aggregated groupBy(doc_id) counts the
    survivors. The corpus is scanned once; nothing corpus-sized
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    arrs = _hashed_shingle_arrays(d)
    train = arrs.filter(F.col("doc_id") % BENCH_MOD != 0)
    bench_sh = (
        arrs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    return (
        train.select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(bench_sh), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


CORPUS_DECONTAMINATE_SQL = f"""
WITH sh AS ({_SHINGLED_SQL}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0)
SELECT s.doc_id, COUNT(*) AS n_shared_shingles
FROM sh s JOIN bench b ON s.shingle = b.shingle
WHERE s.doc_id % {BENCH_MOD} != 0
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def _md5_bucket16(col):
    """0..15 from the first hex char of md5(col) — identical arithmetic
    in Spark and DuckDB (both emit lowercase hex)."""
    c = F.ascii(F.substring(F.md5(col.cast("string")), 1, 1))
    return F.when(c <= 57, c - 48).otherwise(c - 87)


def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment per document: bucket =
    first hex char of md5(doc_id) → 12/2/2 of 16 buckets (75/12.5/12.5%).

    Content-stable hashing (not rand(), not monotonically_increasing_id)
    means the split survives repartitioning, re-ingestion, and engine
    swaps — the property that keeps eval sets frozen across a pipeline's
    lifetime. Pure map-side expression; the oracle replays the identical
    arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    b = _md5_bucket16(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_BUCKETS, F.lit("train"))
        .when(b < SPLIT_TRAIN_BUCKETS + SPLIT_VAL_BUCKETS, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split")).orderBy("doc_id")


CORPUS_SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       CASE WHEN b < {SPLIT_TRAIN_BUCKETS} THEN 'train'
            WHEN b < {SPLIT_TRAIN_BUCKETS + SPLIT_VAL_BUCKETS} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 57
              THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48
              ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
         END AS b
  FROM documents
)
ORDER BY doc_id
"""


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' sample of STRATIFIED_K docs per language:
    smallest-k by md5(text) (doc_id tiebreak for duplicate texts).

    The hash order is uniform but reproducible — unlike df.sample, whose
    per-partition RNG changes with the split layout. Per-group top-k via
    window row_number: partial sort per partition, one shuffle on the
    stratum key; never a global ORDER BY."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATIFIED_K)
        .select("lang", F.col("rn").alias("pick"), "doc_id")
        .orderBy("lang", "pick")
    )


CORPUS_STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, rn AS pick, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
WHERE rn <= {STRATIFIED_K}
ORDER BY lang, pick
"""


def corpus_split_leak_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: every near-dup pair in the
    corpus (word-3-gram Jaccard ≥ 0.5 — the dedup family's detector,
    which subsumes exact duplicates at Jaccard 1.0) labeled with its
    endpoints' train/val/test assignment; one row per unordered split
    pair — (split_a, split_b, n_dup_pairs, is_cross_split). Rows with
    is_cross_split AND n_dup_pairs > 0 are evaluation leaks: a test
    document whose near-twin sits in train (the C4/Pile-era audit every
    corpus release now runs; splits alone don't prevent it because
    near-dups land in buckets independently).

    Scale: the pair detector is the bounded posting-list join (at 100 TB
    the df-capped or LSH form — same audit, same labeling); the split
    label is map-side md5 arithmetic on doc_id, and the labeling joins
    attach one 5-byte string to ids-only pair rows. Nothing here adds a
    corpus-sized shuffle beyond the detector's own."""
    from .dedup import _hashed_shingle_arrays, _jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(
        _hashed_shingle_arrays(d.select("doc_id", "text"))
    ).select("doc_a", "doc_b")
    b = _md5_bucket16(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_BUCKETS, F.lit("train"))
        .when(b < SPLIT_TRAIN_BUCKETS + SPLIT_VAL_BUCKETS, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    splits = d.select("doc_id", split.alias("split"))
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .withColumn(
            "is_cross_split", F.col("split_a") != F.col("split_b")
        )
        .orderBy("split_a", "split_b")
    )


def _split_leak_audit_sql() -> str:
    from .dedup import JACCARD_THRESHOLD, _SHINGLED_SQL

    return f"""
WITH sh AS ({_SHINGLED_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
),
splits AS (
  SELECT doc_id,
         CASE WHEN b < {SPLIT_TRAIN_BUCKETS} THEN 'train'
              WHEN b < {SPLIT_TRAIN_BUCKETS + SPLIT_VAL_BUCKETS} THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 57
                THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48
                ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
           END AS b
    FROM documents
  )
),
lab AS (
  SELECT least(s1.split, s2.split) AS split_a,
         greatest(s1.split, s2.split) AS split_b
  FROM pairs
  JOIN splits s1 ON s1.doc_id = pairs.doc_a
  JOIN splits s2 ON s2.doc_id = pairs.doc_b
)
SELECT split_a, split_b, COUNT(*) AS n_dup_pairs,
       split_a != split_b AS is_cross_split
FROM lab
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


CORPUS_SPLIT_LEAK_AUDIT_SQL = _split_leak_audit_sql()
