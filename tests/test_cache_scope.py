"""plans/cache_scope: the ADVICE-r3 hygiene contract — deduped
registrations, owner-keyed release, and the unconditional drain."""

from __future__ import annotations

from cdc_local_data_pipeline_docker_spark.plans import cache_scope


def test_scoped_persist_dedupes_and_release_drains(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    a = cache_scope.scoped_persist(df)
    # a semantically-identical rebuild (what bench's min-of-N reps do)
    # must NOT append a second registration
    b = cache_scope.scoped_persist(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert len(cache_scope._live) == 1
    assert a.count() == b.count() == 100

    # a different plan registers separately
    cache_scope.scoped_persist(spark.range(50))
    assert len(cache_scope._live) == 2

    cache_scope.release()
    assert cache_scope._live == []


def test_release_previous_keeps_same_owner_warm(spark):
    cache_scope.release()
    cache_scope.release_previous("q1")
    cache_scope.scoped_persist(spark.range(10))
    # same owner again: caches stay registered (warm reps)
    cache_scope.release_previous("q1")
    assert len(cache_scope._live) == 1
    # different owner: drained
    cache_scope.release_previous("q2")
    assert cache_scope._live == []
