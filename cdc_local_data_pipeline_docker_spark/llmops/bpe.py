"""Distributed BPE tokenizer training over the `documents` corpus —
the vocabulary-construction step of an LLM data pipeline (Sennrich et
al. 2016; the merge-table artifact every BPE tokenizer ships).

Scale design: the ONLY corpus-sized pass is the word-frequency reduce
(explode + groupBy — one shuffle). Everything iterative runs on the
DISTINCT-WORD frame weighted by frequency: at 100 TB of text the
vocabulary is millions of rows while the corpus is trillions of tokens,
so per-merge cost is vocabulary-sized and independent of corpus size —
the observation that makes industrial BPE training (GPT-2, SentencePiece)
feasible, reproduced here as a Spark loop:

  per merge step:
    1. adjacent-pair counts: a map-only transform/explode over symbol
       arrays, weighted by word freq, one pair-keyed agg (overlapping
       occurrences count, the reference Counter convention);
    2. argmax pair (count desc, pair asc) — a 1-row collect;
    3. merge application: left-to-right non-overlapping replacement via
       an Arrow-batched pandas UDF over the vocab frame (per-row list
       surgery is genuinely non-relational — the documented custom-
       operator path), persisted per step with lineage cut.

Python is in the loop ONLY on the vocab frame; the corpus never touches
a UDF. Grading follows the k-means contract shape (similarity.py):
`bpe_train_contract` pins exact corpus-derivable numbers plus the
algorithm's invariants as booleans; the raw merge table is a rows-only
sibling; pytest proves bit-equality against a driver-side reference BPE
on both the testdata and random corpora.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table

#: Merge steps to learn. Vocabulary-bounded corpora saturate quickly;
#: the loop stops early if no adjacent pair remains.
N_MERGES = 8


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_udf(left: str, right: str):
    merged = left + right

    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out = []
            i = 0
            n = len(s)
            while i < n:
                if i < n - 1 and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return apply_merge


def train_bpe(words: DataFrame, n_merges: int):
    """Learn `n_merges` BPE merges from a (word, freq) frame.

    Returns (merge_table, final_vocab_df) where merge_table is a list of
    (step, left, right, pair_count) and final_vocab_df the symbolized
    (word, freq, syms) frame after all merges."""
    vocab = words.select(
        "word",
        "freq",
        # split('', ...) can emit empty edge strings; filter them so the
        # symbol array is exactly the character sequence
        F.expr("filter(split(word, ''), c -> c <> '')").alias("syms"),
    ).persist()
    vocab.count()
    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best:
            break
        b = best[0]
        merges.append((step, b.l, b.r, int(b.cnt)))
        nxt = vocab.withColumn(
            "syms", _merge_udf(b.l, b.r)(F.col("syms"))
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, left, right, pair_count): the learned merge table — the
    tokenizer artifact. Rows-only (the iterative argmax is not SQL-
    expressible); exact-replay equality is pytest-pinned against a
    reference implementation."""
    merges, vocab = train_bpe(_word_freqs(spark, sf_dir), N_MERGES)
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "step INT, left STRING, right STRING, pair_count BIGINT"
    ).orderBy("step")


def bpe_train_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract summary row: exact corpus-derivable numbers plus the BPE
    invariants as booleans.

    - n_distinct_words / total_freq: pinned exactly by the oracle.
    - n_merges: the full budget (the corpus saturates far later).
    - counts_nonincreasing: each merge's pair count is <= its
      predecessor's — after merging the argmax pair, every newly created
      pair's count is bounded by the merged count and old pairs only
      shrink, so the argmax sequence cannot rise.
    - counts_positive: every learned merge had at least one occurrence.
    - compresses: total weighted symbol count strictly shrinks vs the
      character baseline (each applied merge removes one symbol per
      occurrence)."""
    words = _word_freqs(spark, sf_dir)
    merges, vocab = train_bpe(words, N_MERGES)
    stats = words.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("freq").alias("total_freq"),
        F.sum(F.col("freq") * F.length("word")).alias("baseline_syms"),
    ).collect()[0]
    final_syms = vocab.agg(
        F.sum(F.col("freq") * F.size("syms")).alias("s")
    ).collect()[0].s
    vocab.unpersist()
    counts = [c for _s, _l, _r, c in merges]
    row = (
        int(stats.n_words),
        int(stats.total_freq),
        len(merges),
        all(a >= b for a, b in zip(counts, counts[1:])),
        all(c > 0 for c in counts),
        int(final_syms) < int(stats.baseline_syms),
    )
    return spark.createDataFrame(
        [row],
        "n_distinct_words BIGINT, total_freq BIGINT, n_merges INT,"
        " counts_nonincreasing BOOLEAN, counts_positive BOOLEAN,"
        " compresses BOOLEAN",
    )


BPE_TRAIN_CONTRACT_SQL = f"""
WITH words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(freq) AS BIGINT) AS total_freq,
       {N_MERGES} AS n_merges,
       TRUE AS counts_nonincreasing,
       TRUE AS counts_positive,
       TRUE AS compresses
FROM words
"""


def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to the corpus: per-document token
    counts under the trained BPE vocab vs the whitespace baseline.

    The tokenizer APPLY step never re-runs merges on documents: the
    trained vocab frame already carries each distinct word's final
    symbol sequence, so tokenization is a (word -> len(syms)) lookup
    join — per-doc counts are one explode + one broadcast-able join +
    one doc-keyed agg, corpus-sized but UDF-free. This is the
    production shape: train once on the frequency table, apply by
    dictionary lookup (unknown words fall back to characters — here the
    vocab covers the corpus by construction).

    Rows-only (the vocab is the iterative artifact); exact-replay
    equality of the underlying merges is pytest-pinned, and the
    compression invariant (bpe <= whitespace-chars, >= whitespace-words)
    is asserted per row in tests."""
    words = _word_freqs(spark, sf_dir)
    merges, vocab = train_bpe(words, N_MERGES)
    lens = vocab.select("word", F.size("syms").alias("n_word_tokens"))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    out = (
        toks.join(F.broadcast(lens), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("n_word_tokens").alias("n_bpe_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
        .orderBy("doc_id")
    )
    # Materialize before dropping the persisted vocab out from under
    # the plan.
    result = out.localCheckpoint(eager=True)
    vocab.unpersist()
    return result
