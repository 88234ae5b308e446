"""Physical-plan quality audit: machine-checkable assertions that the plans
Catalyst produces are the plans a 100 TB deployment needs.

"Correct but mis-planned" is the failure mode the small-sf correctness gate
cannot catch — a query that works on 60k rows but full-scans, skips the
broadcast, or shuffles twice would fall over at cluster scale. These helpers
read `explain("formatted")` output so tests (tests/test_plan_quality.py) pin
the load-bearing plan properties per headline query:

  * filter pushdown reached the parquet scan (PushedFilters non-empty);
  * column pruning held (ReadSchema carries only needed columns);
  * dimension joins broadcast (BroadcastHashJoin, no SortMergeJoin);
  * global top-k planned as TakeOrderedAndProject (never a full sort);
  * map-only passes have no Exchange at all;
  * the hot path is inside WholeStageCodegen.

The reference has no optimizer surface to compare against (SURVEY.md §4);
this audit is the engine's own scale-readiness contract.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """Capture explain('formatted') as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    """Single-line-per-operator physical plan (executedPlan toString) —
    operator arguments (partitioning keys, join build side) stay on the
    operator's own line, unlike 'formatted' which splits them into detail
    sections."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_nodes(plan: str) -> list[str]:
    """The per-scan detail blocks ('(N) Scan parquet ...' sections)."""
    blocks = re.split(r"\n\n", plan)
    return [b for b in blocks if "Scan parquet" in b]


def has_pushed_filters(plan: str, table_hint: str | None = None) -> bool:
    """True if some parquet scan (optionally matching `table_hint` in its
    location) carries a non-empty PushedFilters list."""
    for block in scan_nodes(plan):
        if table_hint and table_hint not in block:
            continue
        m = re.search(r"PushedFilters: \[(.*?)\]", block, re.DOTALL)
        if m and m.group(1).strip():
            return True
    return False


def read_schema_columns(plan: str, table_hint: str) -> set[str]:
    """Column names the scan for `table_hint` actually reads."""
    for block in scan_nodes(plan):
        if table_hint not in block:
            continue
        m = re.search(r"ReadSchema: struct<(.*?)>", block, re.DOTALL)
        if m:
            cols = re.findall(r"(\w+):", m.group(1))
            return set(cols)
    return set()


def count(plan: str, node: str) -> int:
    """Occurrences of a physical node in the plan TREE (the formatted
    output repeats every node in its detail section, so counting must be
    restricted to the tree head). Note `\\bExchange\\b` intentionally does
    not match BroadcastExchange."""
    tree = plan.split("\n\n", 1)[0]
    return len(re.findall(rf"\b{re.escape(node)}\b", tree))


def codegen_spans(spark, build_df) -> int:
    """Number of WholeStageCodegen spans (the `*(n)` markers). AQE hides
    them pre-execution (AdaptiveSparkPlan resolves at runtime) and a
    DataFrame caches its executedPlan, so the DataFrame must be BUILT with
    adaptive planning off — hence the thunk."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df: DataFrame = build_df()
        simple = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(set(re.findall(r"\*\((\d+)\)", simple)))


def count_hash_exchanges(plan: str) -> int:
    """Hash-partitioning exchanges only — the DATA shuffles. Excludes the
    rangepartitioning exchange a cosmetic final ORDER BY introduces (the
    driver compare is order-insensitive; the sort exists for readability)."""
    tree = plan.split("\n\n", 1)[0]
    ids = re.findall(r"\bExchange \((\d+)\)", tree)
    n = 0
    for i in ids:
        m = re.search(
            rf"\({i}\) Exchange\n(?:.*\n)*?Arguments: (\w+)", plan
        )
        if m and m.group(1) == "hashpartitioning":
            n += 1
    return n


def shuffle_stats(df: DataFrame) -> dict[str, int]:
    """EXECUTED shuffle volume of a collected DataFrame: total records
    and bytes written across every Exchange in the final adaptive plan
    (including reused query stages). This turns "the aggregate shuffles
    groups, not rows" from a plan-shape claim into a measured number —
    call AFTER an action on ``df`` (metrics are zero before execution).
    """
    root = df._jdf.queryExecution().executedPlan()
    seen: set[int] = set()
    totals = {"records_written": 0, "bytes_written": 0, "exchanges": 0}

    def walk(node) -> None:
        ident = node.id()
        if ident in seen:
            return
        seen.add(ident)
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        if "Exchange" == name:
            totals["exchanges"] += 1
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                key, metric = kv._1(), kv._2()
                if key == "shuffleBytesWritten":
                    totals["bytes_written"] += metric.value()
                elif key == "shuffleRecordsWritten":
                    totals["records_written"] += metric.value()
        # shuffle/broadcast query stages wrap their subtree in .plan()
        try:
            walk(node.plan())
        except Exception:
            pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(root)
    return totals
