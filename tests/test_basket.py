"""Frequent-pattern mining + triangle counting: structural invariants
beyond the DuckDB oracle parity (which pins exact values)."""

from __future__ import annotations

import pytest

from cdc_local_data_pipeline_docker_spark.operators import basket as BK

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from cdc_local_data_pipeline_docker_spark.session import get_spark

    return get_spark()


def test_pair_mining_support_and_lift_invariants(spark):
    rows = BK.mine_brand_pair_lift(spark, SF_DIR).collect()
    assert rows, "mining should be non-empty on the testdata"
    for r in rows:
        assert r.item_a < r.item_b
        assert r.support >= BK.MIN_SUPPORT
        # a pair cannot out-count either of its items or the basket count
        assert r.pair_n <= min(r.n_a, r.n_b) <= r.n_baskets
        assert r.lift == pytest.approx(
            r.pair_n * r.n_baskets / (r.n_a * r.n_b)
        )


@pytest.mark.slow
def test_triangle_counts_match_brute_force_and_handshake(spark):
    """Degree-ordered orientation must equal the O(n^3) brute count, and
    the per-node total must be 3x the global triangle count (every
    triangle has three corners)."""
    out = {r.item: r for r in BK.graph_triangle_count(spark, SF_DIR).collect()}
    s = BK._pair_stats(spark, SF_DIR).collect()
    edges = {
        (r.item_a, r.item_b)
        for r in s
        if r.pair_n * r.n_baskets / (r.n_a * r.n_b) > 1.0
    }
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    # brute per-node: connected neighbor pairs
    n_triangles = 0
    brute = {}
    for n in nodes:
        nb = sorted(adj[n])
        t = sum(
            1
            for i in range(len(nb))
            for j in range(i + 1, len(nb))
            if (min(nb[i], nb[j]), max(nb[i], nb[j])) in edges
        )
        brute[n] = t
        n_triangles += t
    assert n_triangles % 3 == 0
    assert {n: out[n].triangles for n in nodes} == brute
    for n in nodes:
        deg = out[n].degree
        assert deg == len(adj[n])
        if deg >= 2:
            assert out[n].clustering_coeff == pytest.approx(
                2.0 * brute[n] / (deg * (deg - 1))
            )
            assert 0.0 <= out[n].clustering_coeff <= 1.0
    assert any(v > 0 for v in brute.values()), "graph should have triangles"
