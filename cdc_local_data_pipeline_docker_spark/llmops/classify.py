"""Broadcast-model text classification — the fasttext-style linear
filter shape every large-scale training-data pipeline runs (quality
classifiers à la the CCNet / GPT-3 data pipelines, language filters,
domain routers): TRAIN the model with one distributed aggregation,
COLLECT the KB-sized parameter table to the driver, and SCORE the whole
corpus map-side with the model inlined as a literal map — the corpus
never shuffles for inference.

Why this shape at 100 TB: a linear bag-of-words model over a bounded
vocabulary is (V × L) integers — kilobytes — regardless of corpus size.
Training is one explode → broadcast-semi-join (vocab) → groupBy(token,
lang) count: the only shuffle moves (token, lang) pairs, ~12 bytes per
token occurrence, with map-side partial aggregation collapsing them to
at most V·L rows per partition. Scoring broadcasts the model as a
`token → array<weight per class>` map literal and evaluates
`F.aggregate` + `F.zip_with` per document — whole-stage-codegen'd,
zero joins, zero shuffles. This is exactly how production corpus
filters run: the classifier is trained once (often off-cluster), and
the 100-TB pass is embarrassingly parallel scoring.

Numeric portability: class-conditional token weights are add-one-
smoothed frequencies in FIXED-POINT — weight(l, t) = (count(l, t) + 1)
· 10^6 div (total_l + V), integer division on longs — so Spark and the
DuckDB oracle agree bit-for-bit (no logs, no doubles; log-likelihood
NB ranks identically to this linear score only per-token, so the
linear argmax is a distinct, deterministic model — documented, and the
learning behavior itself is pinned on a controlled two-class fixture
in tests/test_classify.py, since the synthetic testdata's token
distributions are deliberately lang-independent).

Scale cautions encoded here: the vocabulary is TakeOrdered-bounded
(VOCAB_SIZE), the model collect is V·L rows by construction, the map
literal is V keys × L-long arrays, and prediction ties break
deterministically (first maximum over ascending class order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

__all__ = [
    "VOCAB_SIZE",
    "WEIGHT_SCALE",
    "train_classifier",
    "predict_with_model",
    "text_classifier_train",
    "text_classifier_predict",
    "text_classifier_confusion",
]

#: bounded vocabulary: top tokens by total occurrences (ties: token asc)
VOCAB_SIZE = 256
#: fixed-point scale for class-conditional frequencies
WEIGHT_SCALE = 1_000_000


def _tokens(col):
    """Whitespace tokens, empty strings dropped (the module-wide text.py
    convention; testdata text is already lowercase)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def train_classifier(
    docs: DataFrame, label_col: str = "lang"
) -> DataFrame:
    """One-aggregation training pass: (label, token, cnt, weight) for
    every vocabulary token observed in the class, where

      weight = (cnt + 1) * WEIGHT_SCALE div (total_label + VOCAB_SIZE)

    — add-one-smoothed class-conditional frequency in fixed point
    (integer `div`, exact in both engines). The vocabulary is the
    TakeOrdered top VOCAB_SIZE tokens by corpus-wide occurrences; it
    broadcasts into the counting join so the corpus-side shuffle
    carries only in-vocab (token, label) pairs."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col("text"))).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(VOCAB_SIZE)
        .select("token")
    )
    counts = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.groupBy("label").agg(F.sum("cnt").alias("n_label"))
    return (
        counts.join(F.broadcast(totals), "label")
        .select(
            "label",
            "token",
            "cnt",
            F.expr(
                f"(cnt + 1) * {WEIGHT_SCALE}L div (n_label + {VOCAB_SIZE})"
            ).alias("weight"),
        )
    )


def predict_with_model(
    docs: DataFrame, model: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Map-side scoring: the trained model (V·L rows) is collected and
    inlined as ONE `token → array<weight>` map literal (classes in
    ascending label order); each document folds its token list through
    `aggregate`/`zip_with` to an L-long score vector and takes the
    first maximum (deterministic tie-break toward the smallest label).
    No joins, no shuffles — the 100-TB inference pass is a projection.

    Returns (id_col, pred_label, score)."""
    rows = model.select("label", "token", "weight").collect()
    labels = sorted({r["label"] for r in rows})
    idx = {l: i for i, l in enumerate(labels)}
    by_token: dict[str, list[int]] = {}
    for r in rows:
        by_token.setdefault(r["token"], [0] * len(labels))[
            idx[r["label"]]
        ] = r["weight"]
    zero = F.array(*[F.lit(0).cast("long") for _ in labels])
    # ONE server-side-parsed literal for the whole token→weights map —
    # the per-element form (F.lit per token and per weight) cost one
    # py4j round trip per element: V + V·L driver calls before the
    # first task ran (r13, guide §1.2). Tokens are SQL-escaped
    # (backslash and quote); weights are exact BIGINT literals, so the
    # map is value-identical to the lit() form.
    toks = sorted(by_token)
    spark = docs.sparkSession
    # the backslash/quote escaping below assumes the DEFAULT parser
    # (spark.sql.parser.escapedStringLiterals=false); under the legacy
    # true setting backslashes are literal and the escaped tokens would
    # parse to WRONG map keys — fall back to the per-element lit() form
    # there (correct in any parser mode, just one py4j call per element;
    # ADVICE r13)
    legacy_parser = (
        spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        == "true"
    )
    if toks and legacy_parser:
        wmap = F.create_map(
            *[
                x
                for t in toks
                for x in (
                    F.lit(t),
                    F.array(*[F.lit(int(w)).cast("long") for w in by_token[t]]),
                )
            ]
        )
    elif toks:
        tok_sql = ",".join(
            "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for t in toks
        )
        w_sql = ",".join(
            "array(%s)" % ",".join(f"{int(w)}L" for w in by_token[t])
            for t in toks
        )
        wmap = F.expr(f"map_from_arrays(array({tok_sql}), array({w_sql}))")
    else:  # empty model: typed empty map (array() alone is untyped)
        wmap = F.expr(
            "map_from_arrays(CAST(array() AS ARRAY<STRING>), "
            "CAST(array() AS ARRAY<ARRAY<BIGINT>>))"
        )
    scores = F.aggregate(
        _tokens(F.col("text")),
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.coalesce(F.element_at(wmap, t), zero),
            lambda a, b: a + b,
        ),
    )
    label_arr = F.array(*[F.lit(l) for l in labels])
    return docs.select(
        F.col(id_col),
        F.element_at(
            label_arr, F.array_position(scores, F.array_max(scores)).cast("int")
        ).alias("pred_label"),
        F.array_max(scores).alias("score"),
    )


# ---------------------------------------------------------------------------
# registry entries over the documents table (label = lang). The synthetic
# corpus has lang-INDEPENDENT token distributions, so these grade the
# MECHANISM exactly (counts, fixed-point weights, argmax) — the "does it
# learn" property is pinned on a controlled fixture in pytest.
# ---------------------------------------------------------------------------

def text_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded training pass: the full (lang, token, cnt, weight) model
    over the documents table. Oracle: the same vocab/count/fixed-point
    algebra in SQL."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        train_classifier(docs, "lang")
        .withColumnRenamed("label", "lang")
        .orderBy("lang", "token")
    )


TEXT_CLASSIFIER_TRAIN_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS token
  FROM documents
),
vocab AS (
  SELECT token FROM toks GROUP BY token
  ORDER BY COUNT(*) DESC, token LIMIT {VOCAB_SIZE}
),
counts AS (
  SELECT lang, token, COUNT(*) AS cnt
  FROM toks SEMI JOIN vocab USING (token)
  GROUP BY lang, token
),
totals AS (SELECT lang, SUM(cnt) AS n_label FROM counts GROUP BY lang)
SELECT c.lang, c.token, c.cnt,
       CAST((c.cnt + 1) * {WEIGHT_SCALE}
              // (t.n_label + {VOCAB_SIZE}) AS BIGINT) AS weight
FROM counts c JOIN totals t ON c.lang = t.lang
ORDER BY c.lang, c.token
"""


def text_classifier_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded inference pass: per-document predicted class + integer
    score via the broadcast map literal. Oracle: the same train algebra
    plus an explode-join-window replay of the argmax (ties toward the
    smallest lang — `array_position` of the first maximum on the Spark
    side, `ROW_NUMBER ... ORDER BY score DESC, lang` in SQL)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    model = train_classifier(docs, "lang")
    return (
        predict_with_model(docs, model, "doc_id")
        .withColumnRenamed("pred_label", "pred_lang")
        .orderBy("doc_id")
    )


_PREDICT_CTE = f"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS token
  FROM documents
),
vocab AS (
  SELECT token FROM toks GROUP BY token
  ORDER BY COUNT(*) DESC, token LIMIT {VOCAB_SIZE}
),
counts AS (
  SELECT lang, token, COUNT(*) AS cnt
  FROM toks SEMI JOIN vocab USING (token)
  GROUP BY lang, token
),
totals AS (SELECT lang, SUM(cnt) AS n_label FROM counts GROUP BY lang),
weights AS (
  SELECT c.lang, c.token,
         CAST((c.cnt + 1) * {WEIGHT_SCALE}
                // (t.n_label + {VOCAB_SIZE}) AS BIGINT) AS weight
  FROM counts c JOIN totals t ON c.lang = t.lang
),
doc_toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    t -> t <> '')) AS token
  FROM documents
),
labels AS (SELECT DISTINCT lang FROM documents),
hits AS (
  SELECT d.doc_id, w.lang, CAST(SUM(w.weight) AS BIGINT) AS score
  FROM doc_toks d JOIN weights w ON w.token = d.token
  GROUP BY d.doc_id, w.lang
),
allscores AS (
  SELECT doc.doc_id, l.lang, CAST(COALESCE(h.score, 0) AS BIGINT) AS score
  FROM documents doc
  CROSS JOIN labels l
  LEFT JOIN hits h ON h.doc_id = doc.doc_id AND h.lang = l.lang
),
pred AS (
  SELECT doc_id, lang AS pred_lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM allscores
)
"""

TEXT_CLASSIFIER_PREDICT_SQL = _PREDICT_CTE + """
SELECT doc_id, pred_lang, score FROM pred WHERE rn = 1
ORDER BY doc_id
"""


def text_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded evaluation pass: the (lang, pred_lang, n_docs) confusion
    matrix of the self-trained classifier — the fleet-health readout a
    production filter ships with. One L×L aggregate over the map-side
    predictions."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    model = train_classifier(docs, "lang")
    preds = predict_with_model(docs, model, "doc_id").withColumnRenamed(
        "pred_label", "pred_lang"
    )
    return (
        docs.select("doc_id", "lang")
        .join(preds.select("doc_id", "pred_lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


TEXT_CLASSIFIER_CONFUSION_SQL = _PREDICT_CTE + """
SELECT doc.lang, p.pred_lang, COUNT(*) AS n_docs
FROM documents doc
JOIN pred p ON p.doc_id = doc.doc_id AND p.rn = 1
GROUP BY doc.lang, p.pred_lang
ORDER BY doc.lang, p.pred_lang
"""


def stream_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming inference: the model trained ONCE on the static corpus,
    then applied to a document STREAM (three parquet chunks drained as
    three micro-batches, maxFilesPerTrigger=1). Because the scorer is a
    pure projection (the model rides inside the plan as a literal map),
    it drops into Structured Streaming unchanged — per-batch cost is a
    map-only pass over the batch, no state store, no shuffle; this is
    the "score each incoming crawl shard as it lands" production shape.
    Oracle: identical to the batch predict entry (same rows must come
    out, independent of micro-batching)."""
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    model = train_classifier(docs, "lang")
    work = tempfile.mkdtemp(prefix="classifier_stream_")
    try:
        src = os.path.join(work, "incoming")
        docs.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        scored = predict_with_model(stream, model, "doc_id").withColumnRenamed(
            "pred_label", "pred_lang"
        )
        # parquet file sink, not the memory sink (r14, guide §5): the
        # memory sink collected every scored row to the driver and the
        # final sort re-shipped them as a LocalTableScan
        sink = os.path.join(work, "_sink")
        q = (
            scored.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(work, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from ..sources.tablelog import _materialized_scan

        out = spark.read.schema(scored.schema).parquet(sink).orderBy("doc_id")
        return _materialized_scan(spark, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAM_CLASSIFIER_SCORES_SQL = TEXT_CLASSIFIER_PREDICT_SQL


def text_classifier_top_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explainability readout: the top-10 highest-weight vocabulary
    tokens per class (ties toward the smaller token) — what a reviewer
    inspects before letting a trained filter loose on a corpus. One
    window over the V·L model frame; integer fixed-point weights keep
    it hash-exact."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    model = train_classifier(docs, "lang").withColumnRenamed("label", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.col("weight").desc(), F.col("token")
    )
    return (
        model.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "token", "weight")
        .orderBy("lang", "rank")
    )


TEXT_CLASSIFIER_TOP_FEATURES_SQL = _PREDICT_CTE + """
SELECT lang, rank, token, weight FROM (
  SELECT lang, token, weight,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY weight DESC, token) AS INT)
           AS rank
  FROM weights
)
WHERE rank <= 10
ORDER BY lang, rank
"""
