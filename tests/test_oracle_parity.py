"""Every registry query with an oracle must match DuckDB exactly
(row count + columns + order-insensitive values) — the driver's gate."""

from __future__ import annotations

import pytest

from cdc_local_data_pipeline_docker_spark.registry import REGISTRY

from .oracle import compare, duckdb_connection

#: Ungraded (51+) entries whose parity check costs >5 s each — the
#: measured heavy tail of the default lane (pytest.ini). Parity for
#: these runs in the nightly `-m slow` lane; every GRADED entry's
#: parity stays in the default lane unconditionally, so nothing the
#: driver verifies loses its pytest twin.
_SLOW_PARITY = {
    "search_bm25_topk_incremental",
    "cdc_hotkey_monitor",
    "cdc_ingest_sketch_summary",
    "bpe_train_contract",
    "graph_shortest_hops",
    "embedding_kmeans_train",
    "dedup_minhash_incremental_contract",
    "bpe_train_merges",
    "bpe_tokenize_corpus",
}
from cdc_local_data_pipeline_docker_spark.registry import GRADED_WINDOW  # noqa: E402

_GRADED = set(list(REGISTRY)[:GRADED_WINDOW])


def _case(n, *rest):
    if n in _SLOW_PARITY and n not in _GRADED:
        return pytest.param(n, *rest, marks=pytest.mark.slow, id=n)
    return pytest.param(n, *rest, id=n)


ORACLE_CASES = [
    _case(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None
]
ROWS_ONLY_CASES = [
    _case(n, fn) for n, (fn, sql) in REGISTRY.items() if sql is None
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, con, name, fn, sql):
    df = fn(spark, sf_dir)
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"
    # a 0-row result hash-matches trivially — every query must exercise
    # its operators on actual rows at every test sf
    assert df.count() > 0, f"{name}: empty result proves nothing"


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() > 0, f"{name}: empty result proves nothing"
    assert len(df.schema.fields) > 0
