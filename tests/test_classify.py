"""Broadcast-model text classifier: mechanism exactness is graded via
the oracle-parity suite; here we pin the LEARNING behavior on a
controlled fixture (the synthetic documents table has lang-independent
token distributions, so accuracy there is meaningless by design), plus
the map-side plan shape and the deterministic tie-break."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.llmops import classify as C

SF = "/root/testdata/sf0.001"


def _two_class_corpus(spark, n_per_class=60, noise_every=5):
    """Deterministic two-class corpus with genuinely different token
    distributions: class 'aa' draws from alpha-words, 'bb' from
    beta-words, with a shared noise word every few positions."""
    rows = []
    alpha = ["red", "green", "blue", "cyan"]
    beta = ["one", "two", "three", "four"]
    shared = ["the", "and"]
    for i in range(n_per_class):
        toks_a = [alpha[(i + j) % 4] if j % noise_every else shared[j % 2]
                  for j in range(20)]
        toks_b = [beta[(i + j) % 4] if j % noise_every else shared[j % 2]
                  for j in range(20)]
        rows.append((2 * i, "aa", " ".join(toks_a)))
        rows.append((2 * i + 1, "bb", " ".join(toks_b)))
    return spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")


def test_classifier_learns_separable_classes(spark):
    docs = _two_class_corpus(spark)
    model = C.train_classifier(docs, "lang")
    preds = C.predict_with_model(docs, model, "doc_id")
    joined = docs.join(preds, "doc_id")
    acc = (
        joined.filter(F.col("lang") == F.col("pred_label")).count()
        / docs.count()
    )
    assert acc == 1.0  # fully separable by construction


def test_classifier_holdout_generalizes(spark):
    """Train on even doc_ids, score odd ones — the model must carry to
    unseen documents of the same distributions."""
    docs = _two_class_corpus(spark)
    train = docs.filter("doc_id % 4 < 2")
    test = docs.subtract(train)
    model = C.train_classifier(train, "lang")
    preds = C.predict_with_model(test, model, "doc_id")
    joined = test.join(preds, "doc_id")
    acc = (
        joined.filter(F.col("lang") == F.col("pred_label")).count()
        / test.count()
    )
    assert acc == 1.0


def test_model_is_bounded_and_weights_fixed_point(spark):
    docs = _two_class_corpus(spark)
    model = C.train_classifier(docs, "lang").collect()
    assert len(model) <= 2 * C.VOCAB_SIZE
    for r in model:
        assert 0 <= r["weight"] <= C.WEIGHT_SCALE
        assert isinstance(r["weight"], int)


def test_predict_is_map_side_no_shuffle(spark):
    """The inference pass must be a projection: no Exchange, no join —
    the 100 TB scoring economics this module exists for."""
    docs = _two_class_corpus(spark)
    model = C.train_classifier(docs, "lang")
    plan = (
        C.predict_with_model(docs, model, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_unknown_tokens_and_tie_break(spark):
    """Documents with no in-vocab token score 0 for every class and
    deterministically predict the smallest label (first maximum)."""
    docs = _two_class_corpus(spark)
    model = C.train_classifier(docs, "lang")
    oov = spark.createDataFrame(
        [(999, "zz", "qqq www eee")], "doc_id LONG, lang STRING, text STRING"
    )
    row = C.predict_with_model(oov, model, "doc_id").collect()[0]
    assert row["score"] == 0 and row["pred_label"] == "aa"


def test_registry_entries_run_on_testdata(spark):
    m = C.text_classifier_train(spark, SF)
    assert {"lang", "token", "cnt", "weight"} <= set(m.columns)
    assert m.count() > 0
    p = C.text_classifier_predict(spark, SF)
    assert p.columns == ["doc_id", "pred_lang", "score"]
    cm = C.text_classifier_confusion(spark, SF)
    n_docs = (
        spark.read.parquet(SF + "/documents.parquet").count()
    )
    assert cm.agg(F.sum("n_docs")).collect()[0][0] == n_docs


def test_stream_scoring_equals_batch(spark):
    """Micro-batching must not change inference: the streamed scores are
    row-identical to the batch predict pass."""
    batch = sorted(C.text_classifier_predict(spark, SF).collect())
    streamed = sorted(C.stream_classifier_scores(spark, SF).collect())
    assert streamed == batch
