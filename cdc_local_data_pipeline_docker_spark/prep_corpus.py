"""End-to-end corpus preparation CLI — the LLM-training-data product
surface: one command runs quality filter → exact + near dedup →
benchmark decontamination → deterministic split assignment over the
documents table and writes a split-partitioned parquet corpus plus a
JSON audit trail of per-stage counts.

    python -m cdc_local_data_pipeline_docker_spark.prep_corpus \
        --sf-dir /root/testdata/sf0.01 --out /tmp/corpus

Every stage is an already-audited registry operator (curation thresholds,
posting-list near-dup join, broadcast decontamination, md5-bucket
splits) — this module only composes them and adds the sink. The stage
counts come from ONE pass each over progressively smaller frames; the
writes are split-partitioned so downstream training readers
partition-prune their own split.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .llmops.curation import MIN_QUALITY, MIN_TOKENS, _quality
from .llmops.decontam import (
    BENCH_MOD,
    SPLIT_TRAIN_BUCKETS,
    SPLIT_VAL_BUCKETS,
    _md5_bucket16,
)
from .llmops.dedup import (
    _exact_dup_drop_ids,
    _hashed_shingle_arrays,
    _jaccard_pairs,
    anti_join_drop_ids,
)
from .plans.cache_scope import scoped_persist
from .session import get_spark


def prepare_corpus(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Run the full prep chain; write <out_dir>/corpus (partitioned by
    split) and return the per-stage audit counts."""
    d = load_table(spark, sf_dir, "documents")
    n_input = d.count()

    scored = d.select(
        "doc_id", "text", "lang", "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        _quality(F.col("text")).alias("quality"),
    )
    kept = scored.filter(
        (F.col("quality") >= MIN_QUALITY) & (F.col("n_tokens") >= MIN_TOKENS)
    )
    n_quality = kept.count()

    # hash-keyed exact dedup (VERDICT r5 #1): the drop set is ids-only and
    # ∝ duplicate count, so the corpus side never shuffles for this stage
    drop_exact = _exact_dup_drop_ids(kept.select("doc_id", "text"))
    survivors = anti_join_drop_ids(kept, drop_exact)
    arrs = scoped_persist(
        _hashed_shingle_arrays(survivors.select("doc_id", "text"))
    )
    near_drop = (
        _jaccard_pairs(arrs).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    deduped = survivors.join(near_drop, "doc_id", "left_anti")
    n_deduped = deduped.count()

    # the benchmark members themselves are eval data, not training data:
    # held out first, then train docs COLLIDING with them (shared 3-gram)
    # are dropped — the templated synthetic corpus collides heavily, so
    # the audit counts make the cost of 1-gram-level strictness visible
    held_out = deduped.filter(F.col("doc_id") % BENCH_MOD == 0)
    n_eval_held_out = held_out.count()
    candidates = deduped.filter(F.col("doc_id") % BENCH_MOD != 0)
    # contamination check REUSES the persisted survivor shingle arrays
    # (review finding: calling corpus_decontaminate re-shingled the whole
    # raw corpus, including docs already dropped). The benchmark side must
    # still shingle from the FULL corpus — eval membership is defined on
    # raw documents, not survivors — but that side is 1/BENCH_MOD of the
    # data and broadcasts.
    bench_sh = (
        _hashed_shingle_arrays(
            d.filter(F.col("doc_id") % BENCH_MOD == 0).select("doc_id", "text")
        )
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    contaminated = (
        arrs.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(bench_sh), "h")
        .select("doc_id")
        .distinct()
    )
    clean = candidates.join(F.broadcast(contaminated), "doc_id", "left_anti")
    n_clean = clean.count()

    b = _md5_bucket16(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_BUCKETS, F.lit("train"))
        .when(b < SPLIT_TRAIN_BUCKETS + SPLIT_VAL_BUCKETS, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    final = clean.withColumn("split", split).select(
        "doc_id", "text", "lang", "source", "n_tokens", "quality", "split"
    )
    final.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/corpus"
    )

    back = spark.read.parquet(f"{out_dir}/corpus")
    splits = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "n_input": n_input,
        "n_after_quality": n_quality,
        "n_after_dedup": n_deduped,
        "n_eval_held_out": n_eval_held_out,
        "n_after_decontamination": n_clean,
        "splits": splits,
        "out": f"{out_dir}/corpus",
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    spark = get_spark(app_name="prep-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(prepare_corpus(spark, args.sf_dir, args.out)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
