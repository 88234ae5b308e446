"""Sequence packing: concat-and-chunk assignment of documents into
fixed-size training context windows.

Standard LLM pretraining packs the tokenized corpus by concatenating
documents in a fixed order and slicing the stream into CHUNK_TOKENS
windows. The assignment is pure integer math over a global prefix sum
of token counts: a document starting at stream offset ``s`` with ``n``
tokens occupies chunks floor(s/C) .. floor((s+n-1)/C).

The naive prefix sum — ``sum().over(Window.orderBy("doc_id"))`` with no
partition — funnels the whole corpus through ONE reducer: correct at
sf0.01, dead at 100 TB. This implements the scalable two-phase form:

  1. bucket documents by contiguous doc_id range (deterministic, no
     sampling-based partitioner);
  2. per-bucket token totals (tiny: K rows) get their own running sum —
     the only single-partition window touches K rows, not the corpus;
  3. broadcast the bucket base offsets back and take the within-bucket
     prefix sum, which partitions by bucket and parallelizes.

The DuckDB oracle runs the naive global window — both forms compute the
same exact integers, so the scalable plan is hash-checked against the
simple spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Tokens per packed training sequence.
CHUNK_TOKENS = 512

#: Contiguous doc_id ranges per bucket — at 100 TB pick
#: corpus_docs / executor-batch-size; only K totals ever meet in one place.
PACK_BUCKET_DOCS = 100


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, start_offset, start_chunk, end_chunk,
    n_chunks_spanned) for the doc_id-ordered token stream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        (F.col("doc_id") / PACK_BUCKET_DOCS).cast("long").alias("bucket"),
    )

    # Phase 1+2: per-bucket totals, then a running base offset over the
    # K-row bucket table (the only unpartitioned window — K rows).
    bucket_tot = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias(
            "bucket_base"
        ),
    )

    # Phase 3: within-bucket exclusive prefix sum, parallel by bucket.
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(F.broadcast(bases), "bucket")
        .withColumn(
            "start_offset",
            F.col("bucket_base")
            + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
    )
    return (
        placed.select(
            "doc_id",
            "n_tokens",
            "start_offset",
            (F.col("start_offset") / CHUNK_TOKENS).cast("long").alias("start_chunk"),
            (
                (F.col("start_offset") + F.col("n_tokens") - 1) / CHUNK_TOKENS
            )
            .cast("long")
            .alias("end_chunk"),
        )
        .withColumn(
            "n_chunks_spanned", F.col("end_chunk") - F.col("start_chunk") + 1
        )
        .orderBy("doc_id")
    )


CORPUS_PACK_SEQUENCES_SQL = f"""
WITH placed AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(COALESCE(SUM(len(string_split(text, ' ')))
                         OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
  FROM documents
)
SELECT doc_id, n_tokens, start_offset,
       CAST(FLOOR(start_offset / {CHUNK_TOKENS}) AS BIGINT) AS start_chunk,
       CAST(FLOOR((start_offset + n_tokens - 1) / {CHUNK_TOKENS}) AS BIGINT)
         AS end_chunk,
       CAST(FLOOR((start_offset + n_tokens - 1) / {CHUNK_TOKENS})
            - FLOOR(start_offset / {CHUNK_TOKENS}) + 1 AS BIGINT)
         AS n_chunks_spanned
FROM placed
ORDER BY doc_id
"""
