"""Pandas UDF surface: Arrow-vectorized scalar UDF and grouped-map
(applyInPandas) — the §2.C UDF/UDAF row the reference has nothing for.

Both demo operators are deliberately chosen so a SQL oracle can verify
them EXACTLY (string ops / integer ranks — no float accumulation whose
summation order would differ between pandas and SQL engines):

  * scalar: vectorized text normalization ≡ lower(trim(x));
  * grouped-map: per-group ranking ≡ ROW_NUMBER() OVER (...).

The point being demonstrated is the execution contract, not the function
bodies: Arrow batches cross the Python boundary (not rows), the grouped
map gets one pandas DataFrame per group after a single shuffle on the
grouping key, and output schemas are fixed StructTypes. When logic CAN be
a built-in expression it should be (UDFs are the slow path) — these exist
for the cases that genuinely need Python (model scoring, tokenizers,
custom sketches).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table


def _normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalization — one Arrow batch per call."""
    return s.str.strip().str.lower()


def fn_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over customer names; oracle: lower(trim(...)).

    The pandas_udf wrapper is built lazily: the decorator parses its DDL
    return type against the ACTIVE session, so decorating at module import
    would crash any importer without a SparkSession (e.g. the driver
    loading the registry)."""
    normalize_text = pandas_udf(_normalize_series, "string")
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        normalize_text(F.col("c_name")).alias("norm_name"),
        normalize_text(F.col("c_mktsegment")).alias("norm_segment"),
    ).orderBy("c_custkey")


FN_PANDAS_NORMALIZE_SQL = """
SELECT c_custkey,
       lower(trim(c_name)) AS norm_name,
       lower(trim(c_mktsegment)) AS norm_segment
FROM customer
ORDER BY c_custkey
"""


def _rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One pandas DataFrame per nation: rank customers by balance."""
    pdf = pdf.sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    pdf["balance_rank"] = range(1, len(pdf) + 1)
    return pdf[["c_nationkey", "c_custkey", "balance_rank"]]


def fn_pandas_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-nation balance ranking.

    One shuffle on the grouping key, then each group is handed to Python
    as a pandas frame. Oracle: ROW_NUMBER() with the same ordering."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(
            _rank_group, "c_nationkey INT, c_custkey LONG, balance_rank INT"
        )
        .orderBy("c_nationkey", "balance_rank")
    )


FN_PANDAS_GROUP_RANK_SQL = """
SELECT c_nationkey, c_custkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT)
         AS balance_rank
FROM customer
ORDER BY c_nationkey, balance_rank
"""


# ---------------------------------------------------------------------------
# Grouped-AGGREGATE pandas UDF — the vectorized UDAF form (series in,
# scalar out, usable inside groupBy().agg() exactly like a built-in).
# ---------------------------------------------------------------------------

def fn_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag RMS of l_quantity via a grouped-agg pandas UDF.

    Execution contract demonstrated: Spark plans a normal hash
    aggregation shuffle on the group key, then hands each group's column
    to Python as ONE Arrow-backed pandas Series — the UDAF slots into
    ``agg()`` beside built-ins. Exactness: integer-cent arithmetic
    inside, so the SQL oracle reproduces the value bit-for-bit.

    The UDAF is defined here, not at module top level: the pandas_udf
    decorator parses its DDL return type against the ACTIVE session, and
    this module imports before any session exists."""

    @pandas_udf("double")
    def _rms_cents(q: pd.Series) -> float:
        # RMS over EXACT integer cents: the only float steps are one
        # division and one sqrt (both correctly rounded -> engine-
        # portable). int64 sum-of-squares is exact at test scale; a
        # 100 TB deployment sums in DECIMAL or Welford chunks.
        cents = (q * 100).round().astype("int64")
        n = len(cents)
        if n == 0:
            return float("nan")
        return float((int((cents * cents).sum()) / n) ** 0.5 / 100.0)

    @pandas_udf("long")
    def _n(q: pd.Series) -> int:
        # Spark refuses to MIX pandas and built-in aggregates in one agg
        # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a second
        # pandas UDAF rather than F.count.
        return len(q)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _rms_cents(F.col("l_quantity")).alias("rms_qty"),
            _n(F.col("l_quantity")).alias("n"),
        )
        .orderBy("l_returnflag")
    )


FN_PANDAS_GROUPED_AGG_SQL = """
SELECT l_returnflag,
       sqrt(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                     * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
            / COUNT(*)) / 100.0 AS rms_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Spark 4 Arrow-optimized Python UDF (useArrow=True): the third rung of
# the Python-function ladder this module covers — row-at-a-time Python
# SEMANTICS with Arrow-batched TRANSFER, i.e. the drop-in upgrade for
# legacy per-row UDFs that can't be vectorized (pandas UDFs remain the
# hot path when the logic vectorizes). Physical plan shows
# ArrowEvalPython, never BatchEvalPython (the registry-wide hygiene
# sweep pins BatchEvalPython = 0 everywhere).
# ---------------------------------------------------------------------------

def _name_tag(name: str) -> str | None:
    # per-row Python on purpose: the kind of branchy string logic legacy
    # UDFs contain; exactly reproducible in SQL for the oracle. NULL in
    # yields NULL out — matching the oracle's `||` NULL propagation on
    # ALL inputs, not just the never-null TPC-H names (ADVICE r6: the
    # old '0-' fallback silently diverged on NULL); '' splits to ['']
    # and tags '1-' in both engines.
    if name is None:
        return None
    toks = name.split(" ")
    return f"{len(toks)}-{toks[0].lower()}"


def fn_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF over customer names: (c_custkey,
    name_tag) — kept scalar-simple; the point is the API surface and the
    ArrowEvalPython plan node. Oracle: the same string surgery in SQL."""
    from pyspark.sql.functions import udf

    name_tag = udf(_name_tag, "string", useArrow=True)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            name_tag(F.col("c_name")).alias("name_tag"),
        )
        .orderBy("c_custkey")
    )


FN_ARROW_UDF_SQL = """
SELECT c_custkey,
       CAST(len(string_split(c_name, ' ')) AS VARCHAR) || '-'
         || lower(string_split(c_name, ' ')[1]) AS name_tag
FROM customer
ORDER BY c_custkey
"""


def fn_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch API below mapInPandas — the
    iterator yields pyarrow.RecordBatch directly, skipping the
    Arrow→pandas conversion mapInPandas pays per batch (the right call
    when the Python work is itself Arrow/NumPy-native, e.g. tensor
    codecs). Demonstrated on the discounted-price expression so the
    oracle is the plain SQL twin; in the engine the hot path for THIS
    expression stays the built-in column form — the entry pins the API
    shape for workloads that genuinely need Python.

    Scale: identical distribution story to mapInPandas — map-only over
    Arrow batches, no shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    import pyarrow as pa

    def batches(it):
        for rb in it:
            tbl = pa.table(rb)
            ext = tbl.column("l_extendedprice").cast(pa.float64())
            disc = tbl.column("l_discount").cast(pa.float64())
            one = pa.compute.subtract(pa.scalar(1.0), disc)
            # cast passthrough keys explicitly: the declared output
            # schema is authoritative and Arrow will NOT widen int32
            # parquet columns for you (getLong crash otherwise)
            out = pa.table(
                {
                    "l_orderkey": tbl.column("l_orderkey").cast(pa.int64()),
                    "l_linenumber": tbl.column("l_linenumber").cast(pa.int64()),
                    "disc_price": pa.compute.multiply(ext, one),
                }
            )
            yield from out.to_batches()

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    return li.mapInArrow(
        batches,
        "l_orderkey LONG, l_linenumber LONG, disc_price DOUBLE",
    ).orderBy("l_orderkey", "l_linenumber")


FN_ARROW_MAP_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE))
         AS disc_price
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
"""
