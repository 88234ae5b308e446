"""Python user-defined TABLE functions (Spark 4 UDTF API surface).

A UDTF is the lateral-join generalization of a UDF: one input row in,
any number of output rows out, usable in SQL as
``SELECT ... FROM t, LATERAL my_udtf(t.col)``. This module pins the API
with an n-gram exploder whose semantics are BIT-IDENTICAL to the
engine's codegen'd higher-order-array shingler — and the test asserts
that equivalence row-for-row (tests/test_stateful_and_cli.py).

Positioning, per the repo's UDF policy: UDTFs execute row-at-a-time in
Python workers — the SLOW path, never used in any registry query's hot
loop (the production n-gram path is llmops/dedup._span_grams, a pure
codegen explode). The API matters anyway: it is the extension point a
user reaches for when logic genuinely cannot be expressed with
built-ins (external lookups, per-row recursive parsing), and the
equivalence test documents exactly what trading it for the declarative
form costs nothing semantically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import lit, udtf


@udtf(returnType="i INT, gram STRING")
class NGramExploder:
    """Emit (1-based start position, space-joined word n-gram) for every
    n-gram of ``text`` — the UDTF twin of dedup._span_grams. Docs with
    fewer than n tokens yield no rows (same short-doc guard)."""

    def eval(self, text: str, n: int):  # noqa: D102 (API-fixed signature)
        if text is None:
            return
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield i + 1, " ".join(toks[i : i + n])


def explode_ngrams_udtf(
    spark: SparkSession, docs: DataFrame, n: int
) -> DataFrame:
    """(doc_id, i, gram) via the UDTF in a SQL LATERAL join."""
    spark.udtf.register("ngram_exploder", NGramExploder)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, g.i, g.gram
        FROM _udtf_docs d, LATERAL ngram_exploder(d.text, {n}) g
        """
    )


def explode_ngrams_udtf_api(docs: DataFrame, n: int) -> DataFrame:
    """Same, through the DataFrame-side half of the API:
    ``df.lateralJoin(MyUdtf(col(...).outer(), ...))`` — ``.outer()``
    marks the column as a lateral (outer-scope) reference; a plain
    ``col("text")`` does not resolve inside the UDTF call."""
    from pyspark.sql.functions import col

    return docs.lateralJoin(
        NGramExploder(col("text").outer(), lit(n))
    ).select("doc_id", "i", "gram")
