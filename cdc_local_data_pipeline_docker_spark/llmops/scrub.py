"""Corpus scrubbing ops for training-data pipelines: PII redaction,
stopword removal, and corpus n-gram statistics.

All three are map-only (or map + one aggregation) passes built entirely
from JVM-side expressions — regexp chains, array transforms — so they
run inside whole-stage codegen with zero Python in the hot path and
scale linearly with corpus bytes: the 100 TB plan is the sf0.01 plan.

PII note: the synthetic corpus contains no natural PII, so the
redaction query deterministically INJECTS doc_id-derived PII (email /
SSN / phone / IP) before scrubbing — identically in the DuckDB oracle —
and then proves the redaction chain removes every occurrence. The
operator under test is the ordered regexp_replace chain + per-class
counts, which is exactly what a real pipeline runs; only the input
synthesis is a fixture. Redaction order is fixed (email, SSN, phone,
IP) because the classes' patterns could otherwise partially overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .text import STOPWORDS

#: PII patterns — same regex dialect subset (POSIX classes, bounded
#: quantifiers) parses identically under Java regex and DuckDB's RE2.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[A-Za-z]+",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\+1-555-[0-9]{4}",
    "ip": r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+",
}


def _seeded_text() -> F.Column:
    """text + deterministic doc_id-derived PII (the injection fixture)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ssn 123-45-"),
        F.format_string("%04d", F.col("doc_id") % 10000),
        F.lit(" tel +1-555-"),
        F.format_string("%04d", F.col("doc_id") % 10000),
        F.lit(" host 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )


_SEEDED_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com ssn 123-45-' || printf('%04d', doc_id % 10000)"
    " || ' tel +1-555-' || printf('%04d', doc_id % 10000)"
    " || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: count each PII class, then redact all
    classes in a fixed order. Output proves zero residual matches."""
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select("doc_id", _seeded_text().alias("t"))
    counted = seeded.select(
        "doc_id",
        "t",
        *[
            F.regexp_count("t", F.lit(pat)).alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )
    red = F.col("t")
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return (
        counted.withColumn("redacted", red)
        .withColumn(
            "n_residual",
            sum(
                F.regexp_count("redacted", F.lit(pat))
                for pat in PII_PATTERNS.values()
            ),
        )
        .select(
            "doc_id", "n_email", "n_ssn", "n_phone", "n_ip", "n_residual", "redacted"
        )
        .orderBy("doc_id")
    )


def _redact_sql_chain() -> str:
    expr = "t"
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return expr


TEXT_PII_REDACT_SQL = f"""
WITH seeded AS (SELECT doc_id, {_SEEDED_SQL} AS t FROM documents),
red AS (
  SELECT doc_id,
         {", ".join(f"len(regexp_extract_all(t, '{p}')) AS n_{n}"
                    for n, p in PII_PATTERNS.items())},
         {_redact_sql_chain()} AS redacted
  FROM seeded
)
SELECT doc_id, n_email, n_ssn, n_phone, n_ip,
       {" + ".join(f"len(regexp_extract_all(redacted, '{p}'))"
                   for p in PII_PATTERNS.values())} AS n_residual,
       redacted
FROM red
ORDER BY doc_id
"""


def text_stopword_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal: drop stopword tokens, re-join the text, report
    the removal count. Pure array-expression pass (filter + array_join)."""
    d = load_table(spark, sf_dir, "documents")
    arr = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = F.split(F.col("text"), " ")
    kept = F.expr(
        f"filter(split(text, ' '), t -> NOT array_contains(array({arr}), t))"
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (F.size(toks) - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("scrubbed"),
    ).orderBy("doc_id")


TEXT_STOPWORD_SCRUB_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(string_split(text, ' '))
         - len(list_filter(string_split(text, ' '),
                           t -> NOT list_contains([{", ".join(f"'{s}'" for s in STOPWORDS)}], t)))
         AS n_removed,
       array_to_string(
         list_filter(string_split(text, ' '),
                     t -> NOT list_contains([{", ".join(f"'{s}'" for s in STOPWORDS)}], t)),
         ' ') AS scrubbed
FROM documents
ORDER BY doc_id
"""


def text_bigram_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word bigrams. Bigram explode is map-side; the
    count is one shuffle on the bigram key with map-side partials; top-50
    plans as TakeOrderedAndProject (no global sort). Sub-2-token docs
    yield zero bigrams in both engines (guarded sequence)."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = d.select(
        F.explode(
            F.expr(
                """
                transform(
                  if(size(split(text, ' ')) < 2,
                     array(),
                     sequence(1, size(split(text, ' ')) - 1)),
                  i -> concat_ws(' ', slice(split(text, ' '), i, 2)))
                """
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


TEXT_BIGRAM_TOP50_SQL = """
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT unnest(list_transform(
           generate_series(1, greatest(len(toks) - 1, 0)),
           i -> array_to_string(toks[i : i + 1], ' '))) AS bigram
  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 50
"""
