"""Query-scoped cache registry: persist() without session-lifetime leaks.

Several operators legitimately cache an intermediate that feeds multiple
downstream branches with no shared Exchange to reuse (shingle frames,
LSH bucket frames). The DataFrame contract means the query function
cannot unpersist after its caller's terminal action — so over a 50+
query grading/bench session those cached partitions would accumulate
(ADVICE r2). This module bounds that: persists registered via
``scoped_persist`` are released when the NEXT registry query is built
(``registry.queries`` wraps every entry with ``release_previous``), so
at most one query's caches are ever live.

Where the multi-consumer intermediate sits directly ABOVE a shuffle,
prefer no persist at all — AQE's exchange reuse computes the shuffle
once per plan (see q11_important_parts / q15_top_supplier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() the frame and register it for release when the next
    registry query is built."""
    df = df.persist()
    _live.append(df)
    return df


def release_previous() -> None:
    """Unpersist every frame registered since the last call (safe on
    frames whose query already ran — unpersist of consumed caches is a
    no-op for correctness, it only drops the cached partitions)."""
    while _live:
        _live.pop().unpersist()
