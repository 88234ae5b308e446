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
