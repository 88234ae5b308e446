"""Incremental MinHash near-dup detection at ingest time (ROADMAP item 6).

The whole-corpus `dedup_minhash_lsh` recomputes shingles and signatures
for EVERY document per run — correct for backfills, but a live pipeline
ingesting batches should pay per-batch cost, not per-corpus cost. This
maintainer keeps a signature store (fixed 32×int64 per doc — the ONLY
state; raw text is never retained) and, per micro-batch:

  1. computes signatures for the batch's documents only,
  2. LSH-bands the batch and joins it against store ∪ batch —
     candidate pairs always involve ≥1 new doc, so each pair is found
     exactly once, in the batch where its later member arrives,
  3. estimates Jaccard from signature agreement (matching minhash
     components / 32 — the standard unbiased estimator; no shingle
     re-materialization of old docs), keeps pairs ≥ threshold,
  4. appends the new signatures to the store.

Per-batch cost: O(|batch| shingling) + banding join of |batch| rows
against the store's band index — never O(corpus²), never re-shingling
history. At 100 TB the store is a bucketed table on the band keys so the
join is co-located.

Batch-boundary invariant (pytest-pinned): streaming the corpus in ANY
chunking yields exactly the pair set of the one-shot banding pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import MINHASH_PERMS, band_keys, signature_frame

#: Report a pair when its signature-estimated Jaccard clears this.
EST_JACCARD_THRESHOLD = 0.5

_SIG_DDL = "doc_id LONG, sig ARRAY<BIGINT>"
_DOC_DDL = "doc_id LONG, text STRING"


def sig_store_path(out_dir: str) -> str:
    return os.path.join(out_dir, "minhash_sig_store")


def dup_pairs_path(out_dir: str) -> str:
    return os.path.join(out_dir, "minhash_dup_pairs")


def _est_jaccard(sa, sb):
    """Fraction of agreeing minhash components — E[est] = true Jaccard."""
    return (
        F.expr(
            "aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)),"
            " 0, (acc, x) -> acc + x)".format(a=sa, b=sb)
        )
        / F.lit(float(MINHASH_PERMS))
    )


def merge_batch_signatures(
    spark: SparkSession, batch_docs: DataFrame, out_dir: str
) -> None:
    """One incremental step: detect near-dup pairs involving the batch,
    then fold the batch's signatures into the store."""
    new_sigs = signature_frame(batch_docs).persist()
    try:
        spath = sig_store_path(out_dir)
        if os.path.exists(spath):
            store = spark.read.parquet(spath)
        else:
            store = spark.createDataFrame([], _SIG_DDL)

        nb = band_keys(new_sigs)
        ab = band_keys(store).unionByName(nb)
        pairs = (
            nb.select(
                F.col("doc_id").alias("n_id"), F.col("sig").alias("n_sig"),
                "band", "bucket",
            )
            .join(
                ab.select(
                    F.col("doc_id").alias("o_id"), F.col("sig").alias("o_sig"),
                    "band", "bucket",
                ),
                ["band", "bucket"],
            )
            .filter(F.col("n_id") != F.col("o_id"))
            .select(
                F.least("n_id", "o_id").alias("doc_a"),
                F.greatest("n_id", "o_id").alias("doc_b"),
                _est_jaccard("n_sig", "o_sig").alias("est_jaccard"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .filter(F.col("est_jaccard") >= EST_JACCARD_THRESHOLD)
        )
        pairs.write.mode("append").parquet(dup_pairs_path(out_dir))
        new_sigs.write.mode("append").parquet(spath)
    finally:
        new_sigs.unpersist()


def start_incremental_dedup_stream(
    spark: SparkSession,
    doc_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain available document files (JSONL: doc_id, text), maintaining
    the signature store and dup-pair log incrementally per micro-batch.
    ``max_files_per_trigger`` bounds batch size (None = all available)."""
    reader = spark.readStream.schema(_DOC_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(doc_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _id: merge_batch_signatures(df.sparkSession, df, out_dir)
        )
        .option(
            "checkpointLocation",
            os.path.join(out_dir, "_checkpoints_minhash_dedup"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _oneshot_band_pairs(docs: DataFrame) -> DataFrame:
    """One-shot banding pass over the FULL corpus — the reference answer
    the incremental maintainer must reproduce regardless of chunking.
    Identical signature family, banding, and estimator as the per-batch
    path, so set equality is exact (not approximate)."""
    bands = band_keys(signature_frame(docs))
    a = bands.select(
        F.col("doc_id").alias("n_id"), F.col("sig").alias("n_sig"),
        "band", "bucket",
    )
    b = bands.select(
        F.col("doc_id").alias("o_id"), F.col("sig").alias("o_sig"),
        "band", "bucket",
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("n_id") < F.col("o_id"))
        .select(
            F.col("n_id").alias("doc_a"),
            F.col("o_id").alias("doc_b"),
            _est_jaccard("n_sig", "o_sig").alias("est_jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("est_jaccard") >= EST_JACCARD_THRESHOLD)
    )


def dedup_minhash_incremental_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch-boundary-invariance contract for the incremental maintainer
    (graded form — the hash family is not oracle-expressible, the
    invariance is). One row; the DuckDB oracle computes ``n_docs`` from
    the table and pins the booleans TRUE:

      * ``incremental_complete`` — every one-shot pair was found by the
        two-batch replay (no pair lost at a batch boundary),
      * ``incremental_exact`` — the replay found nothing the one-shot
        pass doesn't (each pair reported exactly once, in the batch
        where its later member arrived).

    Together: replayed-in-chunks ≡ one-shot, the property that lets a
    live 100 TB pipeline pay per-batch cost with zero recall loss."""
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incremental = dedup_minhash_incremental(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    oneshot = _oneshot_band_pairs(docs).select("doc_a", "doc_b")
    n_missed = oneshot.join(incremental, ["doc_a", "doc_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    n_extra = incremental.join(oneshot, ["doc_a", "doc_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_extra")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(n_missed)
        .crossJoin(n_extra)
        .select(
            "n_docs",
            (F.col("n_missed") == 0).alias("incremental_complete"),
            (F.col("n_extra") == 0).alias("incremental_exact"),
        )
    )


DEDUP_MINHASH_INCREMENTAL_CONTRACT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       TRUE AS incremental_complete,
       TRUE AS incremental_exact
FROM documents
"""


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry adapter: replay the documents corpus through the
    incremental maintainer in two half-corpus batches, return the
    accumulated pair log. Must equal the one-shot banding pass over the
    full corpus (batch-boundary invariance — pytest-pinned); rows-only
    driver check (the hash family is not oracle-expressible)."""
    import tempfile

    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_dir = tempfile.mkdtemp(prefix="minhash_incremental_")
    mid = docs.select(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    merge_batch_signatures(spark, docs.filter(F.col("doc_id") <= mid), out_dir)
    merge_batch_signatures(spark, docs.filter(F.col("doc_id") > mid), out_dir)
    return (
        spark.read.parquet(dup_pairs_path(out_dir))
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )
