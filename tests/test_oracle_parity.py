"""Every registry query with an oracle must match DuckDB exactly
(row count + columns + order-insensitive values) — the driver's gate."""

from __future__ import annotations

import pytest

from cdc_local_data_pipeline_docker_spark.registry import REGISTRY

from .oracle import compare, duckdb_connection

ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]
ROWS_ONLY_CASES = [(n, fn) for n, (fn, sql) in REGISTRY.items() if sql is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, sf_dir, con, name, fn, sql):
    df = fn(spark, sf_dir)
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"
    # a 0-row result hash-matches trivially — every query must exercise
    # its operators on actual rows at every test sf
    assert df.count() > 0, f"{name}: empty result proves nothing"


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES, ids=[c[0] for c in ROWS_ONLY_CASES])
def test_rows_only_runs(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() > 0, f"{name}: empty result proves nothing"
    assert len(df.schema.fields) > 0
