"""Incrementally-maintained inverted index (IVM for search): the BM25
postings of llmops/retrieval.py kept up to date by document upsert /
delete batches, so a retrieval query never rebuilds the index from the
corpus.

State (all parquet, swap-committed like the other maintainers):
  postings  (doc_id, token, tf)  — the inverted index itself
  doclens   (doc_id, dl)         — per-doc token counts
  tokstats  (token, df)          — document frequency, DELTA-maintained
  corpus    (n_docs, sum_dl, last_batch_id) — scalar stats + replay guard

Per batch (documents with `text`, or NULL text = tombstone), the work is
batch-proportional:
  1. last-image-per-doc within the batch (a doc updated twice in one
     batch folds to its final version);
  2. OLD contributions = state point-lookups on the batch's doc ids
     (semi/anti joins — at 100 TB the states are bucketed on doc_id /
     token so these are co-located probes);
  3. postings'/doclens' = state minus old slice plus tokenized new docs
     — ONLY batch docs are tokenized, the index never rebuilds;
  4. df deltas = -1 per (old doc's distinct token) +1 per (new doc's
     distinct token), folded into tokstats; n_docs/sum_dl likewise.

Query cost after maintenance is the search-engine shape: the scorer
(retrieval.scored_matches_from_index) touches only the QUERY TERMS'
posting lists plus the KB-sized stats — never the corpus.

Exactness: the maintained index must equal the batch-built index
BIT-FOR-BIT, so `search_bm25_topk_incremental` grades against the very
same DuckDB oracle as the batch entry — the final live document set is
constructed to equal the `documents` table (early batches carry
perturbed intermediate versions and a synthetic doc that is later
tombstoned, so the deltas are non-trivial). Chunking invariance and
delta-vs-rebuild equality are pytest-pinned.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..llmops import retrieval as RV

_POSTINGS = "postings"
_DOCLENS = "doclens"
_TOKSTATS = "tokstats"
_CORPUS = "corpus"


def _path(d: str, name: str) -> str:
    return os.path.join(d, name)


def init_state(spark: SparkSession, state_dir: str) -> None:
    os.makedirs(state_dir, exist_ok=True)
    spark.createDataFrame([], "doc_id LONG, token STRING, tf LONG").write.mode(
        "overwrite"
    ).parquet(_path(state_dir, _POSTINGS))
    spark.createDataFrame([], "doc_id LONG, dl LONG").write.mode(
        "overwrite"
    ).parquet(_path(state_dir, _DOCLENS))
    spark.createDataFrame([], "token STRING, df LONG").write.mode(
        "overwrite"
    ).parquet(_path(state_dir, _TOKSTATS))
    spark.createDataFrame(
        [(0, 0, -1)], "n_docs LONG, sum_dl LONG, last_batch_id LONG"
    ).write.mode("overwrite").parquet(_path(state_dir, _CORPUS))


def _tokenize(batch: DataFrame) -> DataFrame:
    return (
        batch.filter(F.col("text").isNotNull())
        .select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def apply_batch(
    spark: SparkSession, state_dir: str, batch: DataFrame, batch_id: int
) -> None:
    """Fold one (doc_id, text|NULL, seq) batch into the index state.

    `seq` orders multiple versions of a doc WITHIN the batch (last
    wins). Replay-safe: a batch_id <= the stored last_batch_id no-ops."""
    corpus = spark.read.parquet(_path(state_dir, _CORPUS)).collect()[0]
    if batch_id <= corpus.last_batch_id:
        return
    last = (
        batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    batch_ids = last.select("doc_id").distinct()

    postings = spark.read.parquet(_path(state_dir, _POSTINGS))
    doclens = spark.read.parquet(_path(state_dir, _DOCLENS))
    tokstats = spark.read.parquet(_path(state_dir, _TOKSTATS))

    old_postings = postings.join(F.broadcast(batch_ids), "doc_id")
    old_lens = doclens.join(F.broadcast(batch_ids), "doc_id")
    new_postings = _tokenize(last)
    new_lens = new_postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))

    # df deltas: -1 per distinct (old doc, token), +1 per distinct new
    df_delta = (
        old_postings.select("token").withColumn("d", F.lit(-1))
        .unionAll(new_postings.select("token").withColumn("d", F.lit(1)))
        .groupBy("token")
        .agg(F.sum("d").alias("delta"))
    )
    tokstats2 = (
        tokstats.join(df_delta, "token", "full_outer")
        .select(
            "token",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("delta"), F.lit(0))
            ).alias("df"),
        )
        .filter(F.col("df") > 0)
    )

    postings2 = postings.join(
        F.broadcast(batch_ids), "doc_id", "left_anti"
    ).unionAll(new_postings)
    doclens2 = doclens.join(
        F.broadcast(batch_ids), "doc_id", "left_anti"
    ).unionAll(new_lens)

    deltas = (
        old_lens.select(F.lit(-1).alias("dn"), (-F.col("dl")).alias("ddl"))
        .unionAll(
            new_lens.select(F.lit(1).alias("dn"), F.col("dl").alias("ddl"))
        )
        .agg(
            F.coalesce(F.sum("dn"), F.lit(0)).alias("dn"),
            F.coalesce(F.sum("ddl"), F.lit(0)).alias("ddl"),
        )
        .collect()[0]
    )
    corpus2 = spark.createDataFrame(
        [
            (
                corpus.n_docs + deltas.dn,
                corpus.sum_dl + deltas.ddl,
                batch_id,
            )
        ],
        "n_docs LONG, sum_dl LONG, last_batch_id LONG",
    )

    new_states = (
        (_POSTINGS, postings2),
        (_DOCLENS, doclens2),
        (_TOKSTATS, tokstats2),
        (_CORPUS, corpus2),
    )
    # Write EVERY tmp before swapping ANY: postings2/tokstats2 lazily
    # read the current state directories, so an early swap would yank
    # files out from under a later write.
    for name, df2 in new_states:
        df2.write.mode("overwrite").parquet(_path(state_dir, name + "_tmp"))
    for name, _df2 in new_states:
        tmp = _path(state_dir, name + "_tmp")
        final = _path(state_dir, name)
        old = _path(state_dir, name + "_old")
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old)


def index_frames(spark: SparkSession, state_dir: str):
    """(tf, dl, df, stats) frames read from the maintained state — the
    drop-in input to retrieval.scored_matches_from_index."""
    tf = spark.read.parquet(_path(state_dir, _POSTINGS))
    dl = spark.read.parquet(_path(state_dir, _DOCLENS))
    df = spark.read.parquet(_path(state_dir, _TOKSTATS))
    stats = spark.read.parquet(_path(state_dir, _CORPUS)).select(
        "n_docs", "sum_dl"
    )
    return tf, dl, df, stats


def build_fixture_batches(spark: SparkSession, sf_dir: str):
    """Three deterministic batches whose FINAL live set equals the
    `documents` table exactly (so the batch-build oracle applies), with
    non-trivial intermediate churn:

      batch 1: even docs final; odd docs PERTURBED (extra tokens);
               synthetic doc -1 (later deleted)
      batch 2: odd docs corrected to final text; doc -1 tombstoned
      batch 3: even-by-4 docs re-written with identical text (no-op
               updates — deltas must cancel)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    b1 = (
        even.select("doc_id", "text", F.lit(0).alias("seq"))
        .unionAll(
            odd.select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" perturbed spark junk")).alias(
                    "text"
                ),
                F.lit(1).alias("seq"),
            )
        )
        .unionAll(
            spark.createDataFrame(
                [(-1, "temporary junk document spark stream", 2)],
                "doc_id LONG, text STRING, seq INT",
            )
        )
    )
    b2 = odd.select("doc_id", "text", F.lit(0).alias("seq")).unionAll(
        spark.createDataFrame(
            [(-1, None, 1)], "doc_id LONG, text STRING, seq INT"
        )
    )
    b3 = even.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", "text", F.lit(0).alias("seq")
    )
    return [b1, b2, b3]


def search_bm25_topk_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BM25 top-k served FROM the incrementally-maintained index after
    the three-batch churn — graded against the SAME DuckDB oracle as the
    batch-built `search_bm25_topk` (the final live set is the documents
    table, and the maintained index must equal the rebuild bit-for-bit)."""
    state_dir = tempfile.mkdtemp(prefix="postings_ivm_")
    try:
        init_state(spark, state_dir)
        for i, b in enumerate(build_fixture_batches(spark, sf_dir)):
            apply_batch(spark, state_dir, b, i)
        tf, dl, df, stats = index_frames(spark, state_dir)
        from ..sources.tablelog import _materialized_scan

        scored = RV.scored_matches_from_index(spark, tf, dl, df, stats)
        return _materialized_scan(spark, RV.topk_from_scored(scored))
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
