"""End-to-end corpus prep CLI (prep_corpus.py): stage monotonicity,
split-partitioned output, and audit-count consistency."""

import pytest
import json
import os

from pyspark.sql import functions as F

from cdc_local_data_pipeline_docker_spark.prep_corpus import prepare_corpus

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_prepare_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "prep")
    stats = prepare_corpus(spark, SF_DIR, out)

    # stage counts shrink monotonically and stay consistent
    assert stats["n_input"] >= stats["n_after_quality"] >= stats["n_after_dedup"]
    assert (
        stats["n_after_dedup"]
        >= stats["n_eval_held_out"] + stats["n_after_decontamination"]
    )
    assert stats["n_after_decontamination"] == sum(stats["splits"].values())
    assert stats["n_after_decontamination"] > 0

    back = spark.read.parquet(stats["out"])
    assert back.count() == stats["n_after_decontamination"]
    # split partitioning survives the roundtrip and prunes
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # no contaminated or benchmark docs in the written corpus
    from cdc_local_data_pipeline_docker_spark.llmops.decontam import (
        BENCH_MOD,
        corpus_decontaminate,
    )

    bad = {r["doc_id"] for r in corpus_decontaminate(spark, SF_DIR).collect()}
    got_ids = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert not (got_ids & bad)
    assert not any(i % BENCH_MOD == 0 for i in got_ids)


def test_prep_corpus_cli(tmp_path, capsys):
    from cdc_local_data_pipeline_docker_spark import prep_corpus as PC

    out = str(tmp_path / "cli")
    rc = PC.main(["--sf-dir", SF_DIR, "--out", out])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["out"].endswith("/corpus")
    assert rep["n_after_decontamination"] == sum(rep["splits"].values())
