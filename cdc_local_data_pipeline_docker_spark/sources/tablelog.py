"""Transaction-log table format on plain parquet: versioned manifests,
atomic optimistic commits, snapshot-isolated reads, time travel,
file-level copy-on-write delete, compaction (OPTIMIZE), and VACUUM —
the Delta/Iceberg commit-protocol mechanics built from first principles
on the filesystem Spark already writes to.

Why an engine needs this at 100 TB: a bare parquet directory has no
atomic multi-file commit — a reader that lists the directory mid-write
sees half an append, and there is no way to delete or rewrite rows
without a reader observing the intermediate state. The fix (identical
in spirit to Delta's `_delta_log/` and Iceberg's metadata tree) is to
make ONE tiny manifest file the unit of atomicity: data files are
written first and are invisible until a manifest referencing them is
published; readers resolve a version from the manifest alone and never
list the data directory.

Design choices, and where they sit on the production spectrum:

* **Snapshot manifests, not deltas.** Every version's manifest carries
  the FULL live-file list plus the add/remove delta for history. Reads
  are O(1 manifest) with zero log replay; the cost is O(live files)
  bytes per commit. Delta instead writes deltas + a periodic parquet
  checkpoint — the right trade once a table holds millions of files;
  at that point the manifest itself becomes a parquet table read
  through the same engine. The protocol below is unchanged either way.
* **Atomic exclusive publish via `os.link`** (hard link fails with
  EEXIST if the target version exists): put-if-absent on the manifest
  name IS the whole commit coordinator. This is exactly Delta's
  requirement on the log store — rename-without-overwrite works
  natively on HDFS/ABFS; on S3 the same API is provided by a
  conditional-put (If-None-Match) or a DynamoDB lock table. Two racing
  writers both prepare data files; exactly one wins the link; the
  loser gets ``CommitConflict`` and retries against the new snapshot.
* **File-level copy-on-write delete.** `log_delete_where` scans the
  snapshot ONCE with `input_file_name()` to find the files that
  contain matching rows (a metadata-sized collect — file paths, not
  rows), rewrites only those files' surviving rows, and commits
  {remove: affected, add: rewritten}. Untouched files are carried by
  reference — at 100 TB a delete touching 0.1% of files rewrites 0.1%
  of the data. (Merge-on-read deletion vectors are the next rung;
  same manifest mechanics, different read path.)
* **Compaction is just another commit** that replaces many small files
  with few big ones — content-identical, so time travel across an
  OPTIMIZE is seamless and a concurrent reader on the old version
  still resolves its files (VACUUM honors a version-retention floor).
* **Crash safety**: a writer dying after data files but before the
  manifest leaves orphans that no reader can see; `log_vacuum`
  deletes any data file not referenced by a retained manifest.

Everything data-sized runs through Spark (`df.write.parquet`,
snapshot reads over the manifest's file list); only manifests — KBs —
touch the driver.

Reference parity note: the reference pipeline ships Iceberg jars it
never uses (SURVEY.md §1.4) and appends bare parquet with coalesce(1)
(kafka_to_s3_enhanced.py) — no atomicity, no time travel, no delete.
This module supplies the table-format layer those jars were meant for.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "CommitConflict",
    "log_append",
    "log_delete_where",
    "log_merge",
    "log_compact",
    "log_read",
    "log_history",
    "log_vacuum",
    "tablelog_time_travel",
]

_LOG_DIR = "_log"
_DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer committed this version first — rebase and retry."""


def _log_path(root: str) -> str:
    return os.path.join(root, _LOG_DIR)


def _manifest_name(version: int) -> str:
    return f"v{version:08d}.json"


def _versions(root: str) -> list[int]:
    log = _log_path(root)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_log_path(root), _manifest_name(version))) as fh:
        return json.load(fh)


def _latest_version(root: str) -> int | None:
    vs = _versions(root)
    return vs[-1] if vs else None


def _write_data_files(
    df: DataFrame, root: str, token: str, stats_cols: list[str] | None = None
) -> tuple[list[str], dict[str, dict[str, list]]]:
    """Write ``df`` under data/<token>/; return (root-relative part
    files, per-file min/max stats for ``stats_cols``). The directory is
    unique per commit attempt, so a losing/crashed writer never collides
    with a winner's files.

    The stats pass is ONE distributed aggregation over the just-written
    files grouped by ``input_file_name()`` — KBs of manifest state per
    thousand files, the Delta/Iceberg file-skipping shape. Only numeric
    and string columns are JSON-stable enough to record; anything else
    is skipped (its files simply never prune)."""
    out_dir = os.path.join(root, _DATA_DIR, token)
    df.write.mode("error").parquet(out_dir)
    rel = []
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".parquet"):
            rel.append(os.path.join(_DATA_DIR, token, f))
    stats: dict[str, dict[str, list]] = {}
    if stats_cols and rel:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        back = spark.read.parquet(out_dir)
        keep = [
            c
            for c in stats_cols
            if c in back.columns
            and back.schema[c].dataType.typeName()
            in {"long", "integer", "short", "byte", "double", "float",
                "string", "date", "decimal"}
        ]
        if keep:
            aggs = []
            for c in keep:
                aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
            rows = (
                back.groupBy(F.input_file_name().alias("_f"))
                .agg(*aggs)
                .collect()
            )
            for r in rows:
                tail = next((p for p in rel if r["_f"].endswith(p)), None)
                if tail is None:
                    continue
                stats[tail] = {
                    c: [
                        _json_val(r[f"mn_{c}"]),
                        _json_val(r[f"mx_{c}"]),
                    ]
                    for c in keep
                }
    return rel, stats


def _json_val(v):
    """JSON-stable scalar for manifest stats (Decimal/date → str)."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _commit(root: str, version: int, manifest: dict) -> int:
    """Atomically publish ``manifest`` as ``version``: write a temp file,
    then hard-link it to the final name. link(2) is atomic and fails with
    EEXIST when the name is taken — put-if-absent, the only primitive the
    protocol needs from the store."""
    log = _log_path(root)
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, os.path.join(log, _manifest_name(version)))
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed at {root}"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def _live_files(root: str, version: int | None = None) -> list[str]:
    if version is None:
        version = _latest_version(root)
        if version is None:
            return []
    return list(_read_manifest(root, version)["live"])


def _base_stats(root: str, base: int | None) -> dict:
    if base is None:
        return {}
    return dict(_read_manifest(root, base).get("stats", {}))


def log_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as new files appended to the table; returns the new
    version. ``stats_cols`` records per-file min/max in the manifest for
    reader-side file skipping. Appends never conflict logically, so on
    CommitConflict the already-written data files are simply
    re-published against the newer snapshot (no rewrite)."""
    token = uuid.uuid4().hex[:12]
    added, new_stats = _write_data_files(df, root, token, stats_cols)
    while True:
        base = _latest_version(root)
        live = _live_files(root, base) if base is not None else []
        version = 0 if base is None else base + 1
        manifest = {
            "version": version,
            "action": "append",
            "add": added,
            "remove": [],
            "live": live + added,
            # deletion vectors on carried files MUST ride along — the
            # model-based sweep caught an append resurrecting
            # MoR-deleted rows when this map was dropped
            "dv": (
                _read_manifest(root, base).get("dv", {})
                if base is not None
                else {}
            ),
            "stats": {**_base_stats(root, base), **new_stats},
            "schema": df.schema.simpleString(),
            "ts": time.time(),
        }
        try:
            return _commit(root, version, manifest)
        except CommitConflict:
            continue  # rebase: appends commute; re-read snapshot and retry


def log_read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Snapshot read at ``version`` (default: latest). Resolves the file
    list from ONE manifest — never lists the data directory, so
    concurrent commits and crash garbage are invisible.

    ``prune=(col, lo, hi)`` applies manifest-level file skipping: only
    files whose recorded [min, max] span overlaps the closed range
    survive; files without stats are always kept (skipping is safe-only,
    like parquet row-group pruning one level up). The predicate itself
    is NOT applied — callers keep their own filter so pruning can never
    change results, only scan less."""
    if version is None:
        version = _latest_version(root)
    files = _live_files(root, version)
    if not files:
        raise ValueError(f"no table at {root} (version={version})")
    if prune is not None:
        col, lo, hi = prune
        stats = _read_manifest(root, version).get("stats", {})
        files = [
            f
            for f in files
            if f not in stats
            or col not in stats[f]
            or stats[f][col][0] is None
            or not (stats[f][col][0] > hi or stats[f][col][1] < lo)
        ]
        if not files:
            # every file pruned: preserve the schema via an empty scan
            # of ONE live file with a false filter
            from pyspark.sql import functions as F

            one = _live_files(root, version)[0]
            return spark.read.parquet(os.path.join(root, one)).filter(
                F.lit(False)
            )
    dvs = _read_manifest(root, version).get("dv", {})
    # schema evolution: when commits up to this version recorded more
    # than one writer schema, merge parquet footers so late columns
    # surface (earlier files read them as NULL). Gated — footer merging
    # costs a per-file read, so same-schema tables skip it; production
    # keeps the schema set in the latest manifest instead of re-reading
    # history (same information, one lookup).
    schemas = {
        _read_manifest(root, v).get("schema")
        for v in _versions(root)
        if v <= version
    } - {None}
    merge = len(schemas) > 1
    return _read_with_dv(spark, root, files, dvs, merge_schema=merge)


def log_delete_where(spark: SparkSession, root: str, predicate: str) -> int:
    """Copy-on-write delete: rewrite ONLY the files that contain rows
    matching ``predicate`` (a Spark SQL boolean expression), carrying
    every other file by reference. Returns the new version.

    The affected-file probe is one predicate-pushed scan projecting
    `input_file_name()` — the collect is file-path-sized (metadata, not
    rows). Conflict policy: delete conflicts with ANY concurrent commit
    (the affected set may have changed), so CommitConflict propagates to
    the caller instead of auto-retrying."""
    from pyspark.sql import functions as F

    base = _latest_version(root)
    if base is None:
        raise ValueError(f"no table at {root}")
    live = _live_files(root, base)
    dvs = _read_manifest(root, base).get("dv", {})
    snap = spark.read.parquet(*[os.path.join(root, f) for f in live])
    affected_abs = {
        r[0]
        for r in snap.filter(F.expr(predicate))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    # input_file_name yields file:// URIs; match on the root-relative tail
    affected = [
        f for f in live if any(a.endswith(f) for a in affected_abs)
    ]
    if not affected:  # nothing to delete: commit a no-op manifest
        manifest = {
            "version": base + 1,
            "action": "delete",
            "add": [],
            "remove": [],
            "live": live,
            "dv": dvs,
            "stats": _base_stats(root, base),
            "predicate": predicate,
            "ts": time.time(),
        }
        return _commit(root, base + 1, manifest)
    # rewrite reads THROUGH any deletion vectors on the affected files
    # (dead rows must not resurrect); their vectors then retire
    survivors = _read_with_dv(spark, root, affected, dvs).filter(
        ~F.expr(predicate)
    )
    token = uuid.uuid4().hex[:12]
    stats_cols = sorted(
        {c for s in _base_stats(root, base).values() for c in s}
    )
    added, new_stats = _write_data_files(survivors, root, token, stats_cols)
    untouched = [f for f in live if f not in set(affected)]
    carried = {
        f: s for f, s in _base_stats(root, base).items() if f in set(untouched)
    }
    manifest = {
        "version": base + 1,
        "action": "delete",
        "add": added,
        "remove": affected,
        "live": untouched + added,
        "dv": {f: d for f, d in dvs.items() if f in set(untouched)},
        "stats": {**carried, **new_stats},
        "predicate": predicate,
        "ts": time.time(),
    }
    return _commit(root, base + 1, manifest)


def log_merge(
    spark: SparkSession, root: str, changes: DataFrame, key_col: str
) -> int:
    """ACID MERGE INTO at the storage layer: upsert ``changes`` (one row
    per key; the target must be key-unique, the merge.py precondition)
    with file-level copy-on-write —

      matched keys   → their files are rewritten with the old images
                       dropped (the change row supplies the new image),
      unmatched keys → plain inserts,

    all in ONE commit: {remove: affected files, add: rewritten ∪ new}.
    Files containing no matched key are carried by reference, so the
    rewrite cost tracks the MATCH LOCALITY, not the table size — with
    key-clustered files (z-order/bucketing upstream) a point-update
    batch touches a handful of files; this is the Delta low-shuffle
    MERGE economics expressed as manifest arithmetic.

    The affected-file probe broadcasts the (bounded) change-key set
    against one `input_file_name()` scan — predicate-pushed, file-path-
    sized collect. Conflict policy: like delete, MERGE conflicts with
    any concurrent commit, so CommitConflict propagates."""
    from pyspark.sql import functions as F

    base = _latest_version(root)
    if base is None:
        raise ValueError(f"no table at {root}")
    live = _live_files(root, base)
    dvs = _read_manifest(root, base).get("dv", {})
    snap = spark.read.parquet(*[os.path.join(root, f) for f in live])
    keys = changes.select(F.col(key_col)).distinct()
    # input_file_name() must bind below the join (single-source rule):
    # project it on the scan side, THEN semi-join the broadcast keys
    probe = snap.select(
        key_col, F.input_file_name().alias("_tablelog_file")
    )
    affected_abs = {
        r[0]
        for r in probe.join(F.broadcast(keys), key_col, "left_semi")
        .select("_tablelog_file")
        .distinct()
        .collect()
    }
    affected = [f for f in live if any(a.endswith(f) for a in affected_abs)]
    survivors = None
    if affected:
        # rewrite reads through deletion vectors (dead rows must not
        # resurrect); the affected files' vectors then retire
        survivors = _read_with_dv(spark, root, affected, dvs).join(
            F.broadcast(keys), key_col, "left_anti"
        )
    new_rows = (
        survivors.unionByName(changes) if survivors is not None else changes
    )
    token = uuid.uuid4().hex[:12]
    stats_cols = sorted(
        {c for s in _base_stats(root, base).values() for c in s}
    )
    added, new_stats = _write_data_files(new_rows, root, token, stats_cols)
    untouched = [f for f in live if f not in set(affected)]
    carried = {
        f: s for f, s in _base_stats(root, base).items() if f in set(untouched)
    }
    manifest = {
        "version": base + 1,
        "action": "merge",
        "add": added,
        "remove": affected,
        "live": untouched + added,
        "dv": {f: d for f, d in dvs.items() if f in set(untouched)},
        "stats": {**carried, **new_stats},
        "ts": time.time(),
    }
    return _commit(root, base + 1, manifest)


def log_compact(
    spark: SparkSession,
    root: str,
    target_files: int = 1,
    zorder_cols: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE: rewrite the live set into ``target_files`` files —
    content-identical, so readers on any version are unaffected and time
    travel crosses the compaction seamlessly.

    ``zorder_cols`` (2+ numeric columns) is OPTIMIZE ZORDER BY: the
    rewrite range-partitions + sorts along the Morton curve of those
    columns (sources/zorder.py), so each output file covers a compact
    hyper-rectangle — which is exactly what makes the manifest's
    min/max stats prune: post-ZORDER, a range probe on any clustered
    column keeps O(matching) files instead of all of them. This is the
    one commit where clustering pays its shuffle; every subsequent
    pruned read amortizes it."""
    base = _latest_version(root)
    if base is None:
        raise ValueError(f"no table at {root}")
    live = _live_files(root, base)
    # read THROUGH any deletion vectors: compaction materializes them
    # (the new files carry no dead rows, the manifest carries no dv map)
    snap = _read_with_dv(
        spark, root, live, _read_manifest(root, base).get("dv", {})
    )
    token = uuid.uuid4().hex[:12]
    if stats_cols is None:
        stats_cols = sorted(
            {c for s in _base_stats(root, base).values() for c in s}
        )
    if zorder_cols:
        from .zorder import zorder_by

        out = zorder_by(snap, *zorder_cols, n_files=target_files)
        stats_cols = sorted(set(stats_cols) | set(zorder_cols))
    else:
        out = snap.coalesce(target_files)
    added, new_stats = _write_data_files(out, root, token, stats_cols)
    manifest = {
        "version": base + 1,
        "action": "compact",
        "add": added,
        "remove": live,
        "live": added,
        "stats": new_stats,
        "ts": time.time(),
    }
    return _commit(root, base + 1, manifest)


def log_history(root: str) -> list[dict]:
    """Commit history: (version, action, files added/removed/live)."""
    return [
        {
            "version": v,
            "action": m["action"],
            "n_added": len(m["add"]),
            "n_removed": len(m["remove"]),
            "n_live": len(m["live"]),
        }
        for v in _versions(root)
        for m in [_read_manifest(root, v)]
    ]


def log_vacuum(root: str, retain_versions: int = 0) -> list[str]:
    """Delete data files referenced by NO retained manifest: crash
    orphans (written but never committed) and, when ``retain_versions``
    trims history, files only old versions referenced. Returns the
    deleted root-relative paths. Never touches a file a retained
    manifest can resolve — pruned versions' manifests are removed too,
    so time travel never dangles."""
    vs = _versions(root)
    if not vs:
        return []
    keep = vs if retain_versions <= 0 else vs[-retain_versions:]
    referenced: set[str] = set()
    for v in keep:
        m = _read_manifest(root, v)
        referenced.update(m["live"])
        referenced.update(m.get("dv", {}).values())
    deleted = []
    data_root = os.path.join(root, _DATA_DIR)
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            rel = os.path.relpath(os.path.join(dirpath, f), root)
            if f.endswith(".parquet") and rel not in referenced:
                os.unlink(os.path.join(dirpath, f))
                deleted.append(rel)
    for v in vs:
        if v not in keep:
            os.unlink(os.path.join(_log_path(root), _manifest_name(v)))
    # drop emptied commit dirs so the data tree stays file-count-sized
    for d in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        p = os.path.join(data_root, d)
        if os.path.isdir(p) and not os.listdir(p):
            os.rmdir(p)
    return sorted(deleted)


# ---------------------------------------------------------------------------
# registry entry: time travel across append / delete / append / compact
# ---------------------------------------------------------------------------

def tablelog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a tablelog table from deterministic slices of ``orders``
    through five commits, then read TWO snapshots back through the log:

      v0 append  orders with o_orderkey % 3 = 0
      v1 append  orders with o_orderkey % 3 = 1
      v2 delete  WHERE o_orderstatus = 'F'   (file-level copy-on-write)
      v3 append  orders with o_orderkey % 3 = 2
      v4 compact (content must be unchanged)

    Output: (version_read, o_orderkey, o_orderstatus, o_totalprice) for
    version_read = 2 (post-delete snapshot) and 4 (latest, post-compact)
    — grading both time travel and the delete/compact content contract
    against a pure-SQL oracle that replays the same slice algebra.

    The result frame is materialized before the scratch table is
    removed (fixture-sized: two column-pruned orders snapshots)."""
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    root = tempfile.mkdtemp(prefix="tablelog_")
    try:
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 0))
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 1))
        log_delete_where(spark, root, "o_orderstatus = 'F'")
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 2))
        log_compact(spark, root, target_files=2)
        v2 = log_read(spark, root, version=2).withColumn(
            "version_read", F.lit(2).cast("long")
        )
        v4 = log_read(spark, root).withColumn(
            "version_read", F.lit(4).cast("long")
        )
        out = (
            v2.unionByName(v4)
            .select("version_read", *cols)
            .orderBy("version_read", "o_orderkey")
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLELOG_TIME_TRAVEL_SQL = """
WITH v2 AS (
  SELECT 2::BIGINT AS version_read, o_orderkey, o_orderstatus, o_totalprice
  FROM orders
  WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus <> 'F'
),
v4 AS (
  SELECT 4::BIGINT AS version_read, o_orderkey, o_orderstatus, o_totalprice
  FROM orders
  WHERE (o_orderkey % 3 IN (0, 1) AND o_orderstatus <> 'F')
     OR o_orderkey % 3 = 2
)
SELECT * FROM v2
UNION ALL
SELECT * FROM v4
ORDER BY version_read, o_orderkey
"""


def log_changes(
    spark: SparkSession, root: str, version: int
) -> tuple[DataFrame | None, DataFrame | None]:
    """Change feed for one commit: (added_rows, removed_rows) as
    DataFrames (None when that side is empty) — the Delta CDF shape at
    file granularity. A commit's delta is resolved entirely from its
    manifest's add/remove lists: no snapshot diffing, no history replay;
    consumers (downstream IVMs, audit jobs, replication) read exactly
    the files that changed. For an append that's the new files only;
    for a CoW delete/merge the removed files carry the OLD images and
    the added files the rewritten ones — a keyed anti-join between the
    two sides recovers row-level before/after when needed.

    MoR-delete commits add VECTORS, not data files, so their row-level
    delta is resolved differently: removed = the newly-dead positions
    joined back to their data files; no added rows."""
    m = _read_manifest(root, version)
    if m["action"] == "delete_mor":
        from pyspark.sql import functions as F

        prev_dv = (
            _read_manifest(root, version - 1).get("dv", {})
            if version > 0
            else {}
        )
        dead_frames = []
        for f, dv in m.get("dv", {}).items():
            new_pos = spark.read.parquet(os.path.join(root, dv))
            if f in prev_dv:  # only the delta positions are newly dead
                old_pos = spark.read.parquet(os.path.join(root, prev_dv[f]))
                new_pos = new_pos.join(old_pos, "row_index", "left_anti")
            rows = (
                spark.read.parquet(os.path.join(root, f))
                .select("*", F.col("_metadata.row_index").alias("_ri"))
                .join(
                    F.broadcast(
                        new_pos.withColumnRenamed("row_index", "_ri")
                    ),
                    "_ri",
                )
                .drop("_ri")
            )
            dead_frames.append(rows)
        if not dead_frames:
            return None, None
        rem = dead_frames[0]
        for d in dead_frames[1:]:
            rem = rem.unionByName(d)
        return None, rem
    add = (
        spark.read.parquet(*[os.path.join(root, f) for f in m["add"]])
        if m["add"]
        else None
    )
    rem = (
        spark.read.parquet(*[os.path.join(root, f) for f in m["remove"]])
        if m["remove"]
        else None
    )
    return add, rem


def tablelog_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the per-commit change feed of the same 5-commit
    fixture table as `tablelog_time_travel`, reduced to the
    SQL-replayable invariant — net row change per version (added −
    removed row counts). File-level accounting (which rows co-rewrite
    with a delete) depends on physical file boundaries, so the graded
    contract is the boundary-independent net; the row-level feed is
    exercised in pytest via the snapshot-count invariant.

      v0/v1/v3 appends: net = slice size; v2 delete: net = −|status F
      among keys %3 ∈ {0,1}|; v4 compact: net = 0."""
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    root = tempfile.mkdtemp(prefix="tablelog_cdf_")
    try:
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 0))
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 1))
        log_delete_where(spark, root, "o_orderstatus = 'F'")
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 2))
        log_compact(spark, root, target_files=2)
        rows = []
        for v in _versions(root):
            m = _read_manifest(root, v)
            add, rem = log_changes(spark, root, v)
            rows.append(
                (
                    v,
                    m["action"],
                    (add.count() if add is not None else 0)
                    - (rem.count() if rem is not None else 0),
                )
            )
        return spark.createDataFrame(
            rows, "version LONG, action STRING, net_rows LONG"
        ).orderBy("version")
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLELOG_CHANGE_FEED_SQL = """
WITH n AS (
  SELECT
    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0) AS n0,
    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1) AS n1,
    (SELECT COUNT(*) FROM orders
      WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus = 'F') AS nf,
    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 2) AS n2
)
SELECT * FROM (
  SELECT 0::BIGINT AS version, 'append' AS action,
         CAST(n0 AS BIGINT) AS net_rows FROM n
  UNION ALL
  SELECT 1, 'append', CAST(n1 AS BIGINT) FROM n
  UNION ALL
  SELECT 2, 'delete', CAST(-nf AS BIGINT) FROM n
  UNION ALL
  SELECT 3, 'append', CAST(n2 AS BIGINT) FROM n
  UNION ALL
  SELECT 4, 'compact', 0 FROM n
)
ORDER BY version
"""


# ---------------------------------------------------------------------------
# Merge-on-read deletion vectors
# ---------------------------------------------------------------------------

def log_delete_where_mor(
    spark: SparkSession, root: str, predicate: str
) -> int:
    """Merge-on-read DELETE: instead of rewriting affected files (the
    copy-on-write path), write a DELETION VECTOR per affected file —
    the (file, row position) list of dead rows — and commit only the
    KB-sized vectors. Readers anti-join the broadcast DV on the
    parquet reader's hidden (_metadata.file_path, _metadata.row_index)
    identity, so a delete touching millions of wide rows costs minutes
    of scan and kilobytes of write instead of rewriting terabytes —
    Delta/Iceberg v2 deletion-vector economics.

    The write-amplification trade: CoW pays at delete time and keeps
    reads clean; MoR pays a per-read anti-join until a compaction
    materializes the vectors (log_compact drops them — it rewrites
    content through the DV-applied read). Point deletes / GDPR erasure
    on huge tables want MoR; bulk reshaping wants CoW.

    DV files are parquet (file tail + row_index) under the commit's own
    data dir; the manifest maps data-file → dv-file cumulatively, so a
    second MoR delete on an already-vectored file UNIONS positions via
    a fresh vector that supersedes the old (the old stays for time
    travel)."""
    from pyspark.sql import functions as F

    base = _latest_version(root)
    if base is None:
        raise ValueError(f"no table at {root}")
    m = _read_manifest(root, base)
    live = m["live"]
    dvs: dict[str, str] = dict(m.get("dv", {}))
    # read WITH existing vectors applied so re-deletes don't duplicate
    snap = _read_with_dv(spark, root, live, dvs).filter(F.expr(predicate))
    hits = snap.select(
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.row_index").alias("row_index"),
    )
    token = uuid.uuid4().hex[:12]
    dv_dir = os.path.join(root, _DATA_DIR, token)
    rows = hits.collect()  # positions of deleted rows: KB-scale metadata;
    # at production scale this stays distributed (write per-file DV
    # partitions directly); the grouping below is the same computation
    by_file: dict[str, list[int]] = {}
    for r in rows:
        tail = next((f for f in live if r["_fp"].endswith(f)), None)
        if tail is not None:
            by_file.setdefault(tail, []).append(r["row_index"])
    if not by_file:
        manifest = {**{k: m[k] for k in ("live",)},
                    "version": base + 1, "action": "delete_mor",
                    "add": [], "remove": [], "dv": dvs,
                    "stats": _base_stats(root, base),
                    "predicate": predicate, "ts": time.time()}
        return _commit(root, base + 1, manifest)
    os.makedirs(dv_dir, exist_ok=True)
    new_dvs = dict(dvs)
    added = []
    for i, (f, idxs) in enumerate(sorted(by_file.items())):
        # new vector = old vector (if any) ∪ new positions
        old = []
        if f in dvs:
            old = [
                r["row_index"]
                for r in spark.read.parquet(
                    os.path.join(root, dvs[f])
                ).collect()
            ]
        dv_df = spark.createDataFrame(
            [(x,) for x in sorted(set(old) | set(idxs))],
            "row_index LONG",
        ).coalesce(1)
        sub = os.path.join(dv_dir, f"dv-{i:04d}")
        dv_df.write.mode("error").parquet(sub)
        part = next(
            p for p in sorted(os.listdir(sub)) if p.endswith(".parquet")
        )
        rel = os.path.join(_DATA_DIR, token, f"dv-{i:04d}", part)
        new_dvs[f] = rel
        added.append(rel)
    manifest = {
        "version": base + 1,
        "action": "delete_mor",
        "add": added,  # DV files ride the add list so vacuum sees them
        "remove": [],
        "live": live,
        "dv": new_dvs,
        "stats": _base_stats(root, base),
        "predicate": predicate,
        "ts": time.time(),
    }
    return _commit(root, base + 1, manifest)


def _read_with_dv(
    spark: SparkSession,
    root: str,
    files: list[str],
    dvs: dict[str, str],
    merge_schema: bool = False,
) -> DataFrame:
    """Scan ``files`` with deletion vectors applied: rows whose
    (file, row_index) appears in a vector are filtered by ONE broadcast
    anti-join. The DV side is KB-sized by construction."""
    from pyspark.sql import functions as F

    df = spark.read.option(
        "mergeSchema", "true" if merge_schema else "false"
    ).parquet(*[os.path.join(root, f) for f in files])
    needed = {f: dv for f, dv in dvs.items() if f in set(files)}
    if not needed:
        return df
    dv_frames = []
    for f, dv in needed.items():
        dv_frames.append(
            spark.read.parquet(os.path.join(root, dv)).select(
                F.lit(f).alias("_dv_file"), F.col("row_index")
            )
        )
    all_dv = dv_frames[0]
    for d in dv_frames[1:]:
        all_dv = all_dv.unionByName(d)
    with_id = df.select(
        "*",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/data/"), -1
        ).alias("_tail"),
        F.col("_metadata.row_index").alias("_ri"),
    ).withColumn("_tail", F.concat(F.lit(_DATA_DIR + "/"), F.col("_tail")))
    out = with_id.join(
        F.broadcast(all_dv),
        (F.col("_tail") == F.col("_dv_file"))
        & (F.col("_ri") == F.col("row_index")),
        "left_anti",
    )
    return out.drop("_tail", "_ri")


def fold_changes_into_agg(
    state: DataFrame | None, add: DataFrame | None, rem: DataFrame | None
) -> DataFrame:
    """Fold one commit's change feed into a (o_orderstatus, n_orders,
    sum_cents) aggregate state: state + Σ(added) − Σ(removed), grouped
    once over the union. COUNT and SUM are self-inverting under
    negation, so the CDF's (add, remove) pair is a SUFFICIENT interface
    for downstream incremental maintenance — no key lookups, no old-image
    store; the state is group-cardinality-sized and the per-commit cost
    is one partial+final agg over the DELTA, independent of table size."""
    from pyspark.sql import functions as F

    def side(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            (F.count(F.lit(1)) * sign).alias("n_orders"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * 100
                * sign
            )
            .cast("long")
            .alias("sum_cents"),
        )

    parts = []
    if state is not None:
        parts.append(state)
    if add is not None:
        parts.append(side(add, 1))
    if rem is not None:
        parts.append(side(rem, -1))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    from pyspark.sql import functions as F

    return (
        u.groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .filter(F.col("n_orders") != 0)
    )


def tablelog_cdf_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM THROUGH the change feed: the per-status order aggregate
    maintained by folding each commit's (added, removed) delta — never
    rescanning the table — over the same 5-commit fixture as
    `tablelog_time_travel`. Graded against the plain GROUP BY over the
    final slice algebra: the maintained state must equal the recompute
    exactly, proving the CDF interface is sufficient for downstream
    incremental views (the Delta CDF → streaming-agg pattern).

    Each fold is one agg over the commit's delta files only; the
    running state is localCheckpointed per version (group-cardinality-
    sized) so the plan stays flat across arbitrarily long histories."""
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    root = tempfile.mkdtemp(prefix="tablelog_cdf_ivm_")
    try:
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 0))
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 1))
        log_delete_where(spark, root, "o_orderstatus = 'F'")
        log_append(spark, root, orders.filter(F.col("o_orderkey") % 3 == 2))
        log_compact(spark, root, target_files=2)
        state = None
        for v in _versions(root):
            add, rem = log_changes(spark, root, v)
            state = fold_changes_into_agg(state, add, rem).localCheckpoint(
                eager=True
            )
        out = state.orderBy("o_orderstatus")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLELOG_CDF_AGG_VIEW_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS sum_cents
FROM orders
WHERE (o_orderkey % 3 IN (0, 1) AND o_orderstatus <> 'F')
   OR o_orderkey % 3 = 2
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def log_restore(spark: SparkSession, root: str, version: int) -> int:
    """RESTORE the table to a historical version — a METADATA-ONLY
    commit whose live set (and deletion vectors, and stats) are the
    target version's. Nothing is copied: the restored version's files
    are still on disk (vacuum retention permitting), so rollback after
    a bad write is one KB manifest regardless of table size — the Delta
    RESTORE shape. History is preserved: the bad versions stay
    time-travelable and the restore is itself a new version."""
    target = _read_manifest(root, version)
    base = _latest_version(root)
    manifest = {
        "version": base + 1,
        "action": "restore",
        "add": [],
        "remove": [],
        "live": target["live"],
        "dv": target.get("dv", {}),
        "stats": target.get("stats", {}),
        "restored_from": version,
        "ts": time.time(),
    }
    return _commit(root, base + 1, manifest)
