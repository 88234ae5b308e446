"""Z-order (Morton-curve) file clustering + sketch-backed file skipping:
multi-dimensional data skipping for parquet scans.

Sorting files by ONE column gives tight per-file min/max stats on that
column and useless (full-range) stats on every other — a scan filtered
on a second dimension prunes nothing. Interleaving the bits of two or
more dimensions into a single Morton code and range-partitioning +
sorting on it bounds the per-file span of EVERY interleaved dimension:
an N-dimensional predicate box then overlaps only the files whose
min/max hyper-rectangles intersect it, and parquet row-group stats skip
the rest. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, built here from plain DataFrame expressions.

On top of the layout, `write_zorder_table` computes a per-file stats
sidecar in one distributed pass — min/max per clustered column plus a
small two-hash bloom bitmap per column — and `read_zorder_table`
consults it to hand Spark ONLY the overlapping files. min/max answers
range boxes; the bloom answers equality probes that min/max can't (a
value inside a file's [min, max] span but absent from the file), the
same role as parquet column bloom filters / Delta file-skipping stats,
except the index here is an engine-readable KB-sized JSON the planner
layer applies BEFORE Spark lists any file.

Everything in the layout pass is JVM-side bit arithmetic
(shiftright/&/|) — whole-stage codegen, no UDFs. The write is one
repartitionByRange shuffle, paid once per layout pass (same economics
as bucketing: amortized over every subsequent pruned scan). The stats
pass reads the written files back once, aggregating by
``input_file_name()`` — per-file min/max + ≤`BLOOM_BITS`-bit sets, KBs
of state per thousand files.

The payoff is MEASURED, not asserted by folklore:
tests/test_plan_quality.py::test_zorder_layout_prunes_two_dim_boxes
(2-D vs single-sort) and ::test_zorder_3dim_stats_pruning (3-D box vs
2-D layout, bloom equality pruning, and pruned-scan correctness) read
real parquet footer stats / the sidecar and count files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Max bits in the combined Morton code (fits a signed 64-bit long).
ZORDER_CODE_BITS = 48
#: Bits per dimension in the 2-D code (legacy constant; N dims use
#: ZORDER_CODE_BITS // N, so 2-D keeps 16 bits/dim... see _bits_per_dim).
ZORDER_BITS = 16

#: File-skipping bloom geometry: two independent xxhash64 probes into a
#: BLOOM_BITS-wide bitmap per (file, column). With ~2k distinct values
#: per file the fill fraction stays ≲0.4, so the equality-probe false
#: positive rate is ≲0.16 — good enough to skip most non-containing
#: files, never wrong in the keep direction (blooms have no false
#: negatives, so pruning is always safe).
BLOOM_BITS = 4096
_BLOOM_SEEDS = (0x5EED1, 0x5EED2)

_STATS_FILE = "_zorder_stats.json"


def _bits_per_dim(n_dims: int) -> int:
    """16 bits/dim for ≤3 dims (48-bit codes); shrink for more dims so
    the interleaved code stays inside a signed long."""
    return min(ZORDER_BITS, ZORDER_CODE_BITS // n_dims)


def _scale_to_bits(col: F.Column, lo: F.Column, hi: F.Column, bits: int) -> F.Column:
    """Map a numeric column into [0, 2^bits) rank space using the
    (broadcast) min/max. Constant columns map to 0."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col - lo).cast("double") / span.cast("double")
    scaled = (frac * ((1 << bits) - 1)).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))


def _interleave(dims: list[F.Column], bits: int) -> F.Column:
    """Morton code over N dimensions: bit i of dimension d lands at
    position N*i + d. Unrolled to N*bits OR-terms of shift/mask
    expressions — pure codegen, no UDF. For N=2 this is bit-identical
    to the classic (a even, b odd) 2-D interleave."""
    # Column.&/| are BOOLEAN ops in PySpark — bit math needs the
    # explicit bitwiseAND/bitwiseOR methods (and a long-typed mask).
    one = F.lit(1).cast("long")
    n = len(dims)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(dims):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(one), n * i + d)
            )
    return z


def zorder_by(df: DataFrame, *cols: str, n_files: int | None = None) -> DataFrame:
    """Return ``df`` re-arranged along the Morton curve of ``cols`` (2+
    numeric columns), in ``n_files`` range partitions, each sorted by
    the code — write with ``.write.parquet`` and every output file
    covers a compact hyper-rectangle of the N-D key space.

    Accepts the historical positional form ``zorder_by(df, a, b, 16)``
    (trailing int = n_files) as well as ``n_files=`` keyword.

    The min/max normalization constants come from a 1-row aggregate
    broadcast back over the data — one extra cheap job, no collect."""
    if n_files is None and cols and isinstance(cols[-1], int):
        *cols, n_files = cols
    if n_files is None or len(cols) < 2:
        raise ValueError("zorder_by needs >=2 columns and n_files")
    bits = _bits_per_dim(len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    stats = df.agg(*aggs)
    dims = [
        _scale_to_bits(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        for c in cols
    ]
    with_z = df.join(F.broadcast(stats)).withColumn("_z", _interleave(dims, bits))
    drop = ["_z"] + [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols]
    return (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(*drop)
    )


def write_zorder_table(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    stats_cols: list[str] | None = None,
) -> None:
    """Z-order ``df`` on ``cols``, write parquet at ``path``, then build
    the per-file skipping sidecar (min/max + bloom bitmap per column) in
    ONE distributed pass over the written files. ``stats_cols`` (default
    = ``cols``) may list EXTRA columns to collect stats for — stats on a
    non-clustered column are cheap to record but only prune if the
    layout happens to bound its per-file span."""
    zorder_by(df, *cols, n_files=n_files).write.mode("overwrite").parquet(path)

    stats_cols = list(stats_cols or cols)
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("_file"), *stats_cols
    )
    stats = _file_stats(back, stats_cols)
    # xxhash64 output depends on the INPUT TYPE (int and long hash
    # differently) — record each column's type so equality probes cast
    # their literal to exactly the hashed type before re-hashing.
    dtypes = {c: back.schema[c].dataType.simpleString() for c in stats_cols}
    with open(os.path.join(path, _STATS_FILE), "w") as f:
        json.dump(
            {
                "cols": stats_cols,
                "zcols": list(cols),
                "dtypes": dtypes,
                "bloom_bits": BLOOM_BITS,
                "files": stats,
            },
            f,
        )


def _file_stats(back: DataFrame, stats_cols: list[str]) -> dict:
    """Per-file min/max + bloom bit sets from a (_file, *stats_cols)
    frame — one groupBy over whatever file subset ``back`` scans."""
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        for si, seed in enumerate(_BLOOM_SEEDS):
            aggs.append(
                F.collect_set(
                    F.pmod(F.xxhash64(F.col(c), F.lit(seed)), F.lit(BLOOM_BITS))
                ).alias(f"bloom{si}_{c}")
            )
    rows = back.groupBy("_file").agg(*aggs).collect()
    return {
        os.path.basename(r["_file"]): {
            c: {
                "min": r[f"min_{c}"],
                "max": r[f"max_{c}"],
                "bloom": [sorted(r[f"bloom{si}_{c}"]) for si in (0, 1)],
            }
            for c in stats_cols
        }
        for r in rows
    }


def append_zorder_table(
    spark: SparkSession, df: DataFrame, path: str, n_files: int = 1
) -> list[str]:
    """Append a batch to an existing z-order table, maintaining the
    skipping sidecar INCREMENTALLY: the batch is z-ordered within itself
    (on the table's recorded clustering columns, so its files also carry
    compact spans), written in append mode, and ONLY the new files are
    scanned for stats — existing entries are merged through untouched.
    This is the same no-rescan economics as the streaming sketch state:
    sidecar maintenance cost tracks the batch, not the table. Returns
    the new file names.

    Appended batches normalize their Morton ranks against their OWN
    min/max (codes are transient, never stored), so per-file spans stay
    tight even as the table's global domain drifts."""
    stats_path = os.path.join(path, _STATS_FILE)
    with open(stats_path) as f:
        meta = json.load(f)
    before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    zorder_by(df, *meta["zcols"], n_files=n_files).write.mode("append").parquet(
        path
    )
    new_files = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and f not in before
    ]
    back = spark.read.parquet(
        *[os.path.join(path, f) for f in new_files]
    ).select(F.input_file_name().alias("_file"), *meta["cols"])
    meta["files"].update(_file_stats(back, meta["cols"]))
    with open(stats_path, "w") as f:
        json.dump(meta, f)
    return sorted(new_files)


def _xxhash64_seeded(spark: SparkSession, value, dtype: str, seed: int) -> int:
    """Driver-side twin of the executor bloom probe — one tiny local
    job so the probe hash is EXACTLY Spark's xxhash64 (no Python
    reimplementation to drift), with the literal cast to the hashed
    column's type (xxhash64 of int and long differ)."""
    return (
        spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(F.lit(value).cast(dtype), F.lit(seed)),
                F.lit(BLOOM_BITS),
            )
        )
        .first()[0]
    )


def prune_files(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple] | None = None,
    eq: dict[str, object] | None = None,
    use_bloom: bool = True,
) -> list[str]:
    """File names at ``path`` that can contain rows matching the
    conjunction of ``ranges`` ({col: (lo, hi)} inclusive boxes) and
    ``eq`` ({col: value} equality probes). min/max rejects
    non-overlapping boxes; the bloom additionally rejects equality
    probes whose bit pair is absent (safe: blooms never false-negative)."""
    with open(os.path.join(path, _STATS_FILE)) as f:
        meta = json.load(f)
    probes = {}
    if use_bloom:
        for c, v in (eq or {}).items():
            probes[c] = [
                _xxhash64_seeded(spark, v, meta["dtypes"][c], seed)
                for seed in _BLOOM_SEEDS
            ]
    keep = []
    for fname, cols in meta["files"].items():
        ok = True
        for c, (lo, hi) in (ranges or {}).items():
            s = cols[c]
            if s["max"] < lo or s["min"] > hi:
                ok = False
                break
        if ok:
            for c, v in (eq or {}).items():
                s = cols[c]
                if s["min"] > v or s["max"] < v:
                    ok = False
                    break
                if use_bloom and not all(
                    p in s["bloom"][si] for si, p in enumerate(probes[c])
                ):
                    ok = False
                    break
        if ok:
            keep.append(fname)
    return sorted(keep)


def read_zorder_table(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple] | None = None,
    eq: dict[str, object] | None = None,
    use_bloom: bool = True,
) -> DataFrame:
    """Scan only the files the sidecar says can match — the predicate
    itself must still be applied on top (pruning is file-granular).
    Returns an empty frame of the table's schema when nothing can
    match."""
    files = prune_files(spark, path, ranges=ranges, eq=eq, use_bloom=use_bloom)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def compact_zorder_table(
    spark: SparkSession,
    path: str,
    n_files: int = 1,
    small_bytes: int = 1 << 20,
) -> tuple[list[str], list[str]]:
    """Incremental OPTIMIZE for a z-order table: merge the SMALL files
    (every append leaves n_files-per-batch stragglers; < ``small_bytes``
    each) into ``n_files`` freshly z-ordered files, leaving large files
    untouched — the Delta/Iceberg OPTIMIZE economics where compaction
    cost tracks the stragglers, not the table. The skipping sidecar is
    maintained the same way: dead entries dropped, ONLY the replacement
    files scanned for stats. Returns (removed, added) file names.

    Local-FS sequencing (single writer, same assumption as the sidecar
    itself): new files land via parquet append before the originals are
    unlinked, so a concurrent reader of the DATA never loses rows; at
    cluster scale this step is the table format's commit-protocol job.
    Compacted rows re-normalize Morton ranks against their own min/max,
    identical to append batches."""
    stats_path = os.path.join(path, _STATS_FILE)
    with open(stats_path) as f:
        meta = json.load(f)
    small = [
        f
        for f in meta["files"]
        if os.path.getsize(os.path.join(path, f)) < small_bytes
    ]
    if len(small) <= n_files:  # nothing to gain
        return [], []
    merged = spark.read.parquet(*[os.path.join(path, f) for f in small])
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    zorder_by(merged, *meta["zcols"], n_files=n_files).write.mode(
        "append"
    ).parquet(path)
    added = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and f not in before
    ]
    back = spark.read.parquet(
        *[os.path.join(path, f) for f in added]
    ).select(F.input_file_name().alias("_file"), *meta["cols"])
    new_stats = _file_stats(back, meta["cols"])
    for f in small:
        os.remove(os.path.join(path, f))
        del meta["files"][f]
    meta["files"].update(new_stats)
    with open(stats_path, "w") as f:
        json.dump(meta, f)
    return sorted(small), sorted(added)


def vacuum_zorder_table(path: str) -> list[str]:
    """Delete data files NOT referenced by the skipping sidecar and
    return their names. The sidecar is the reader's source of truth
    (prune_files/read_zorder_table only ever hand Spark files listed in
    it), so a crash between compaction's append and its unlink leaves
    ORPHANS — present on disk, absent from the sidecar, invisible to
    sidecar-driven readers, never lost data. Vacuum reclaims the space;
    tests/test_plan_quality.py simulates the crash and proves readers
    stay exact before and after. This is the same crash model as Delta/
    Iceberg VACUUM: the metadata commit (here the sidecar rewrite) is
    the atomic point, data files are immutable and cleaned lazily."""
    with open(os.path.join(path, _STATS_FILE)) as f:
        live = set(json.load(f)["files"])
    orphans = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and f not in live
    ]
    for f in orphans:
        os.remove(os.path.join(path, f))
    return sorted(orphans)
