#!/usr/bin/env python3
"""Regenerate PLANS.md: the executed physical plan of each headline
query at sf0.01, plus the plan-shape counters the scale story rests on
(joins by strategy, exchanges, codegen spans, pushed filters). Run after
any plan-affecting change:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_local_data_pipeline_docker_spark import registry  # noqa: E402
from cdc_local_data_pipeline_docker_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

#: name -> one-line "why this plan is the right 100 TB plan" annotation.
QUERIES = {
    "q1_pricing_summary": "partial+final agg; 6 of 11 columns read; "
    "filter pushed to the parquet scan",
    "q3_shipping_priority": "filtered dims broadcast; top-10 is "
    "TakeOrderedAndProject, never a global sort",
    "q5_local_supplier_volume": "6-table star: dims broadcast, one "
    "fact-side shuffle",
    "join_broadcast_dims": "3 BHJ, 0 SMJ — the fact never enters an "
    "Exchange",
    "merge_into_orders": "full-outer MERGE: ONE key-shuffle (the "
    "Delta-MERGE bound); see lowshuffle twin for the broadcast regime",
    "merge_into_orders_lowshuffle": "broadcast change set: zero "
    "hash-partitioned Exchange — the target streams map-side",
    "dedup_span_coverage": "gram keys are xxhash64 longs; 3 shuffles, "
    "linear in token count",
    "corpus_curation_pipeline": "exact-dedup stage shuffles 44-byte "
    "hash rows + ids-only broadcast anti-join — text never shuffles",
    "dedup_semantic": "IVF-cell-local pairs; ids-only pair shuffle; "
    "vectors attach once per unique pair",
    "ann_cosine_topk": "bounded query side broadcasts; corpus scans "
    "once, never shuffles",
    "events_resample_interpolate": "union+window gap-fill: ONE "
    "user-keyed shuffle, no range join",
    "corpus_dedup_against_reference": "both dedup tiers key on 8-byte "
    "hashes; hot/drop sets broadcast",
    "cdc_gold_customer_orders": "no forced join strategy (r7): AQE "
    "sizes the rollup at runtime; bucketed-silver twin is exchange-free",
    "cdc_gold_order_lines": "fact x bounded-dim left join, one "
    "order_id rollup shuffle; AQE picks the broadcast",
    "search_bm25_topk": "corpus appears only as posting lists; query "
    "terms + 1-row stats broadcast; per-query top-k window",
    "cdc_snapshot_chunk_merge": "KB chunk-spec broadcast range join; "
    "one pk-keyed window shared by log and snapshot frames",
    "events_session_concurrency": "two-phase prefix sum: one hour-keyed "
    "shuffle + a calendar-sized carry spine",
    "sessions_overlap_pairs": "binned interval self-join: bucket-keyed "
    "equi-join, emit-once rule — no inequality join, no dedup pass",
    "events_cusum_drift": "CUSUM closed form: ONE event_type Exchange "
    "+ Sort feeds two Window operators and the final agg; all DECIMAL",
    "text_bigram_coherence": "map-only slice+zip bigram extraction; "
    "two partial+final aggs; (w1,w2)-keyed scoring join",
    "contrastive_triplet_mining": "bounded query side broadcasts with "
    "labels; one scored corpus scan; one window picks both winners",
    "events_drift_histogram": "one scan, map-side bucket assignment, "
    "one (type,bucket) partial+final agg — output independent of input",
    "text_classifier_predict": "model rides as a literal map: the scoring pass "
    "is ONE projection — no join, no hash Exchange; the range Exchange here "
    "is only the graded output sort (the bare scorer is plan-pinned "
    "Exchange-free in test_classify); train runs separately: TakeOrdered "
    "vocab + token-keyed partial+final agg",
}


def _summarize(plan: str) -> str:
    counters = {
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
        "ShuffledHashJoin": len(re.findall(r"ShuffledHashJoin", plan)),
        "BroadcastNestedLoopJoin": len(
            re.findall(r"BroadcastNestedLoopJoin", plan)
        ),
        "Exchange(hash)": len(re.findall(r"Exchange hashpartitioning", plan)),
        "Exchange(range)": len(re.findall(r"Exchange rangepartitioning", plan)),
        "TakeOrdered": len(re.findall(r"TakeOrderedAndProject", plan)),
        # distinct span ids, not operator markers: every operator inside
        # a span repeats its "*(n)" prefix, so counting matches inflates
        # the number ~5-10x (ADVICE r6). Counted over the truncation cap
        # — a >200 KB plan under-counts and says so in the file header.
        "WholeStageCodegen": len(
            set(re.findall(r"\*\((\d+)\)", set_max(plan)))
        ),
    }
    return ", ".join(f"{k}={v}" for k, v in counters.items() if v)


def set_max(plan: str, cap: int = 200_000) -> str:
    return plan[:cap]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    lines = [
        "# PLANS — executed physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at sf0.01 on local[*]; plans",
        "are the FINAL adaptive (AQE) plans after execution. The counters",
        "line is the machine-checkable shape each plan must keep",
        "(tests/test_plan_quality.py pins the load-bearing ones).",
        "",
    ]
    for name, note in QUERIES.items():
        if name not in qs:
            continue
        df = qs[name](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip exprIds for readability/stability (#123L -> #L)
        clean = re.sub(r"#\d+", "#", plan)
        # keep the tree head: operators, not the full attribute dump
        head = "\n".join(clean.splitlines()[:40])
        lines += [
            f"## {name}",
            "",
            f"**Why this shape:** {note}",
            "",
            f"**Counters:** {_summarize(plan)}",
            "",
            "```",
            head,
            "```",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
