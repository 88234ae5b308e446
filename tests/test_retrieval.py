"""Ranked-retrieval operators: BM25 fixed-point scoring and RRF fusion.

The DuckDB oracle (test_oracle_parity) proves cross-engine equality; the
tests here prove the SEMANTICS: the fixed-point score matches an
independent Python re-scoring of the corpus, and the fused ranking obeys
the RRF formula exactly.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from cdc_local_data_pipeline_docker_spark.llmops import retrieval as RV

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    return {r.doc_id: r.text.split(" ") for r in rows}


def _brute_bm25(corpus, query_terms):
    n = len(corpus)
    dl = {d: len(t) for d, t in corpus.items()}
    avgdl = sum(dl.values()) / n
    tf = {d: Counter(t) for d, t in corpus.items()}
    df = Counter()
    for c in tf.values():
        for tok in c:
            df[tok] += 1
    scores = {}
    for d, c in tf.items():
        s = 0
        for tok in query_terms:
            if c[tok] == 0:
                continue
            idf = (2 * (n - df[tok]) + 1) / (2 * df[tok] + 1)
            tfsat = c[tok] * (RV.BM25_K1 + 1.0) / (
                c[tok]
                + RV.BM25_K1
                * ((1.0 - RV.BM25_B) + RV.BM25_B * dl[d] / avgdl)
            )
            s += math.floor(idf * tfsat * RV.SCORE_SCALE)
        if s:
            scores[d] = s
    return scores


def test_bm25_matches_brute_python_rescoring(spark, corpus):
    """Every graded (query, doc, score_fp) triple equals an independent
    driver-side BM25 computation with the same fixed-point rule."""
    out = RV.search_bm25_topk(spark, SF).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {q for q, _ in RV.QUERIES}
    for qid, text in RV.QUERIES:
        terms = sorted(set(text.split(" ")))
        brute = _brute_bm25(corpus, terms)
        want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[: RV.TOP_K]
        got = [(r.doc_id, r.score_fp) for r in sorted(
            by_query[qid], key=lambda r: r.rank
        )]
        assert got == want, f"query {qid}"


def test_bm25_ranks_are_dense_and_scores_monotone(spark):
    out = RV.search_bm25_topk(spark, SF).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a.score_fp, -a.doc_id) >= (b.score_fp, -b.doc_id)


def test_rrf_scores_follow_the_formula_and_fuse_both_rankers(spark):
    """rrf_fp recomputes exactly from the two ranks, and the fusion is
    non-degenerate: it is not just ranker A re-sorted."""
    out = RV.search_hybrid_rrf(spark, SF).collect()
    assert out, "empty fusion"
    saw_disagreement = False
    for r in out:
        ra = 1.0 / (RV.RRF_K + r.rank_bm25) if r.rank_bm25 else 0.0
        rb = 1.0 / (RV.RRF_K + r.rank_cov) if r.rank_cov else 0.0
        assert r.rrf_fp == math.floor((ra + rb) * 1_000_000_000)
        if (r.rank_bm25 or 99) != (r.rank_cov or 99):
            saw_disagreement = True
    assert saw_disagreement, "rankers never disagreed — fusion is vacuous"
