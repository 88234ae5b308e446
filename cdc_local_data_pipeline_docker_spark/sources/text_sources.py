"""Schema'd text-format sources (CSV / JSONL) with explicit malformed-row
policy — the ingest-side counterpart of the CDC DLQ story.

The engine's stance everywhere is FIXED schemas (catalog.py docstring): no
inference in any hot path — at 100 TB an inference pass is a full extra
scan, and a drifting inferred schema silently corrupts downstream tables.
These helpers wrap the built-in readers with that stance plus the three
malformed-row policies Spark offers:

  * PERMISSIVE + corrupt-record column → quarantine-able (the default
    here; mirrors cdc/parse.split_quarantine),
  * DROPMALFORMED → lossy but clean,
  * FAILFAST → abort on first bad row (for trusted inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Name of the captured raw-record column in PERMISSIVE mode.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema_ddl: str, mode: str) -> str:
    if mode.upper() == "PERMISSIVE":
        return f"{schema_ddl}, {CORRUPT_COL} STRING"
    return schema_ddl


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    mode: str = "PERMISSIVE",
    header: bool = True,
) -> DataFrame:
    """Fixed-schema CSV scan with explicit malformed policy."""
    return (
        spark.read.schema(_with_corrupt(schema_ddl, mode))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Fixed-schema JSON-lines scan with explicit malformed policy."""
    return (
        spark.read.schema(_with_corrupt(schema_ddl, mode))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, corrupt) for a PERMISSIVE read — corrupt rows keep the raw
    record for replay, good rows drop the capture column.

    The frame is cached first: Spark (2.3+) refuses queries over raw
    CSV/JSON that reference ONLY the internal corrupt-record column
    (the parser would need a second pass to know corruption), and the
    quarantine side is exactly such a query. Caching materializes the
    parse once, which the two-consumer split wants anyway."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad
