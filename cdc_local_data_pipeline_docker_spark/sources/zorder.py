"""Z-order (Morton-curve) file clustering: multi-dimensional data
skipping for parquet scans.

Sorting files by ONE column gives tight per-file min/max stats on that
column and useless (full-range) stats on every other — a scan filtered
on a second dimension prunes nothing. Interleaving the bits of two
(or more) dimensions into a single Morton code and range-partitioning +
sorting on it bounds the per-file span of EVERY interleaved dimension:
a two-dimensional predicate box then overlaps only the files whose
(min,max) rectangles intersect it, and parquet row-group stats skip the
rest. This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
built here from plain DataFrame expressions.

Everything is JVM-side bit arithmetic (shiftright/&/|) — whole-stage
codegen, no UDFs. The write is one repartitionByRange shuffle, paid
once per layout pass (same economics as bucketing: amortized over
every subsequent pruned scan).

The payoff is MEASURED, not asserted by folklore:
tests/test_plan_quality.py::test_zorder_layout_prunes_two_dim_boxes
writes the same data single-dim-sorted and z-ordered, reads real
per-file parquet footer stats via pyarrow, and checks the z-layout
intersects strictly fewer files for a two-dimensional query box.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code (16 -> 32-bit codes for 2-D).
ZORDER_BITS = 16


def _scale_to_bits(col: F.Column, lo: F.Column, hi: F.Column) -> F.Column:
    """Map a numeric column into [0, 2^ZORDER_BITS) rank space using the
    (broadcast) min/max. Constant columns map to 0."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col - lo).cast("double") / span.cast("double")
    scaled = (frac * ((1 << ZORDER_BITS) - 1)).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << ZORDER_BITS) - 1))


def _interleave(a: F.Column, b: F.Column) -> F.Column:
    """Morton code: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Unrolled to ZORDER_BITS OR-terms of shift/mask expressions —
    pure codegen, no UDF."""
    # Column.&/| are BOOLEAN ops in PySpark — bit math needs the
    # explicit bitwiseAND/bitwiseOR methods (and a long-typed mask).
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int) -> DataFrame:
    """Return ``df`` re-arranged along the Morton curve of
    (``col_a``, ``col_b``), in ``n_files`` range partitions, each sorted
    by the code — write with ``.write.parquet`` and every output file
    covers a compact rectangle of the 2-D key space.

    The min/max normalization constants come from a 1-row aggregate
    broadcast back over the data — one extra cheap job, no collect."""
    stats = df.agg(
        F.min(col_a).alias("_lo_a"),
        F.max(col_a).alias("_hi_a"),
        F.min(col_b).alias("_lo_b"),
        F.max(col_b).alias("_hi_b"),
    )
    with_z = df.join(F.broadcast(stats)).withColumn(
        "_z",
        _interleave(
            _scale_to_bits(F.col(col_a), F.col("_lo_a"), F.col("_hi_a")),
            _scale_to_bits(F.col(col_b), F.col("_lo_b"), F.col("_hi_b")),
        ),
    )
    return (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_lo_a", "_hi_a", "_lo_b", "_hi_b")
    )
