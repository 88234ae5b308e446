"""Data-mixture ops: per-source sampling rates for corpus composition.

Training-data pipelines re-weight sources (web/books/code/...) by
sampling each at its own rate. Two ops:

* ``corpus_mixture_plan`` — the exact bookkeeping: per-source document
  and token counts, the configured rate, and the expected sample size.
  Fully oracle-checked (integer/decimal math only).

* ``corpus_mixture_sample`` — the sample itself via
  ``DataFrame.sampleBy`` (per-stratum Bernoulli, seeded). Sampling
  rides the scan (a map-only filter over an XORShift stream keyed by
  the seed — no shuffle, no driver state, any corpus size). RNG draws
  are engine-specific, so there is no cross-engine oracle; instead the
  property tests pin: determinism under the fixed seed, subset-of-
  corpus, and per-source rates within a binomial tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Per-source sampling rates. The corpus's sources are src0..src19
#: (measured domain); rates cycle a 4-tier weighting so every tier is
#: exercised (keep-all, half, quarter, three-quarter).
_TIERS = (1.0, 0.5, 0.25, 0.75)
MIXTURE_RATES: dict[str, float] = {
    f"src{i}": _TIERS[i % len(_TIERS)] for i in range(20)
}

MIXTURE_SEED = 42


def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus stats + configured rate + expected sampled
    docs (floor(n_docs * rate) — exact: rate scaled to integer)."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(r))
            for s, r in MIXTURE_RATES.items()
        ],
        F.lit(0.0),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars")).alias("n_chars_total"),
        )
        .withColumn("rate", rate)
        # exact: n_docs * (rate*100 as int) / 100, floored
        .withColumn(
            "expected_docs",
            (
                F.col("n_docs") * (F.col("rate") * 100).cast("long") / 100
            ).cast("long"),
        )
        .select("source", "n_docs", "n_chars_total", "rate", "expected_docs")
        .orderBy("source")
    )


_RATE_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in MIXTURE_RATES.items()
) + " ELSE 0.0 END"

CORPUS_MIXTURE_PLAN_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       CAST({_RATE_CASE} AS DOUBLE) AS rate,
       CAST(FLOOR(COUNT(*) * CAST(({_RATE_CASE}) * 100 AS BIGINT) / 100)
            AS BIGINT) AS expected_docs
FROM documents
GROUP BY source
ORDER BY source
"""


def corpus_mixture_sample(
    spark: SparkSession, sf_dir: str, seed: int = MIXTURE_SEED
) -> DataFrame:
    """The seeded per-source sample (doc_id, source). Deterministic for
    a fixed seed; rates verified by property test, not oracle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.sampleBy("source", fractions=MIXTURE_RATES, seed=seed)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def corpus_mixture_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold twin of ``corpus_mixture_sample`` with an EXACT
    oracle: keep a doc iff its md5 bucket (first hex char of
    md5('<source>:<doc_id>'), 16 buckets, source-salted so strata are
    independent) falls under rate×16 — every configured rate (1, .75,
    .5, .25) is an integer bucket count, so both engines make the
    identical keep/drop decision per row.

    Same map-only scan-ride as sampleBy, with two extra properties a
    pipeline wants: reproducible across ENGINES (not just across runs of
    one engine's RNG), and stable under repartitioning — the kept set is
    a pure function of (source, doc_id). At 100 TB this is the sampler
    you can re-run on a different cluster and diff byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    c = F.ascii(
        F.substring(
            F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
    )
    bucket = F.when(c <= 57, c - 48).otherwise(c - 87)
    rate = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(r)) for s, r in MIXTURE_RATES.items()],
        F.lit(0.0),
    )
    return (
        d.filter(bucket < (rate * 16).cast("int"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


CORPUS_MIXTURE_SAMPLE_HASH_SQL = f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         CASE WHEN ascii(substr(md5(source || ':' || CAST(doc_id AS VARCHAR)),
                               1, 1)) <= 57
              THEN ascii(substr(md5(source || ':' || CAST(doc_id AS VARCHAR)),
                               1, 1)) - 48
              ELSE ascii(substr(md5(source || ':' || CAST(doc_id AS VARCHAR)),
                               1, 1)) - 87
         END AS b,
         CAST(({_RATE_CASE}) * 16 AS INT) AS keep_buckets
  FROM documents
)
WHERE b < keep_buckets
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic seeded corpus shuffle into balanced training shards
# ---------------------------------------------------------------------------

#: Epoch seed baked into the shuffle key — a new epoch string re-shuffles
#: the whole corpus without touching any other input.
SHUFFLE_SEED = "epoch0"
#: Shard count. 16 hex values split evenly over 8 shards, so the
#: first-hex-digit bucket is exactly uniform over md5's output space.
N_SHARDS = 8

_SHARD_DIGIT = (
    "CASE WHEN ascii(substr(shuffle_key, 1, 1)) BETWEEN 48 AND 57 "
    "THEN ascii(substr(shuffle_key, 1, 1)) - 48 "
    "ELSE ascii(substr(shuffle_key, 1, 1)) - 87 END"
)


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle of the corpus into N balanced
    training shards — the step between curation and tokenization in every
    LLM data pipeline (examples must reach training in an order that is
    random-looking, reproducible, and resumable).

    shuffle_key = md5('<seed>:<doc_id>') gives a pseudorandom total order
    that is a pure function of (seed, doc_id): re-running on any cluster,
    any partitioning, any engine yields the identical order. shard =
    first-hex-digit(key) % 8 is map-only (no shuffle, no global sort, no
    driver state) and balanced in expectation — at 100 TB each shard is
    within a fraction of a percent of 1/N by the binomial bound, which is
    what training wants (NOT exact-equal ntile sharding, whose global
    row_number needs a single-partition window — a scale-killer).
    The physical write path is ``write_training_shards``."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(SHUFFLE_SEED), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    return keyed.select(
        "doc_id",
        "shuffle_key",
        (F.expr(_SHARD_DIGIT) % N_SHARDS).cast("int").alias("shard"),
    ).orderBy("shuffle_key")


CORPUS_SHUFFLE_SHARDS_SQL = f"""
SELECT doc_id, shuffle_key,
       CAST(({_SHARD_DIGIT}) % {N_SHARDS} AS INT) AS shard
FROM (
  SELECT doc_id,
         md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
ORDER BY shuffle_key
"""


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = N_SHARDS, seed: str = SHUFFLE_SEED
) -> None:
    """Materialize the shuffled corpus as ``path/shard=K/*.parquet``.

    One hash-repartition on the shard id (the only shuffle), then a
    per-partition sort on the shuffle key: every output file is written
    by exactly one task's one shard slice, so each FILE is internally
    ordered by shuffle_key — a training reader that streams files in
    any order still sees a seeded pseudorandom example order, and a
    resume can seek within a file by key. No global sort, no ntile, no
    single-partition window anywhere."""
    keyed = docs.select(
        "*",
        F.md5(
            F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    ).withColumn("shard", (F.expr(_SHARD_DIGIT) % n_shards).cast("int"))
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
