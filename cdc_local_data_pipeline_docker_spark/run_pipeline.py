"""End-to-end pipeline runner — the engine's twin of the reference's
run_pipeline.sh / run_pipeline.py / Airflow DAG (SURVEY.md §3.1-3.2).

Where the reference orchestrates 10 docker services, shells into
containers, and subprocess-runs one Spark script per table
(cdc_auto_sync_every_5min.py:96-107), this is one process, one
SparkSession, one command:

    python -m cdc_local_data_pipeline_docker_spark.run_pipeline \
        --events-dir /tmp/events --out-dir /tmp/warehouse [--tables orders,...]

Per table: incremental offset-resumed ingest (cdc/ingest.py), then the
count-verification the DAG did via psql+mc subprocesses (U8) computed as
one aggregation, then the latest-state view the reference never had.
Re-running is safe (offset watermark → no-op) — the 5-minute cron
semantic is just "invoke this on a schedule", or use
streaming/ingest_stream.py for the checkpointed live form.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .catalog import CDC_PRIMARY_KEYS
from .cdc import fixtures as FX
from .cdc.ingest import ingest_table, materialize_latest
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events-dir", required=False, default=None,
                    help="dir with <table>.jsonl topic files; generated "
                         "fixtures are used if omitted")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--tables", default=",".join(CDC_PRIMARY_KEYS),
                    help="comma list (default: all four)")
    ap.add_argument("--asof-offset", type=int, default=None,
                    help="also report live_rows at this historical offset "
                         "(point-in-time query over the changelog)")
    ap.add_argument("--parallel", type=int, default=1,
                    help="tables ingested concurrently (Spark schedules "
                         "the jobs FAIR across driver threads; per-table "
                         "offset state is independent so runs don't race)")
    ap.add_argument("--multi-topic", action="store_true",
                    help="ingest every table-topic through ONE streaming "
                         "query with a single checkpoint (subscribePattern "
                         "analogue; replaces per-table offset state)")
    ap.add_argument("--sketch-state", action="store_true",
                    help="also maintain per-table ingest sketches (HLL "
                         "distinct keys + t-digest + exact count, folded "
                         "per micro-batch) and report their summary")
    ap.add_argument("--agg-view", action="store_true",
                    help="also maintain the incrementally-updated grouped "
                         "aggregate view (streaming/incremental_view.py; "
                         "tables with a VIEW_SPECS entry) and report it")
    ap.add_argument("--gold-views", action="store_true",
                    help="also maintain BOTH multi-topic gold join views "
                         "(customers⋈orders and order_items⋈products) via "
                         "the multiplexed IVM streams and report them")
    ap.add_argument("--tablelog", action="store_true",
                    help="also maintain <out>/tablelog/<table> as an "
                         "ACID transaction-log table (one MERGE commit "
                         "per micro-batch, batch-id exactly-once) and "
                         "report per-table version/live-file/row counts")
    ap.add_argument("--compact", action="store_true",
                    help="also report the compacted changelog per table "
                         "(last event per key, tombstones retained as "
                         "delete markers): upsert/delete marker counts "
                         "and the fold ratio events/keys")
    args = ap.parse_args(argv)

    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    unknown = [t for t in tables if t not in CDC_PRIMARY_KEYS]
    if unknown:
        ap.error(
            f"unknown table(s) {unknown}; valid: {', '.join(CDC_PRIMARY_KEYS)}"
        )

    events_dir = args.events_dir
    if events_dir is None:
        events_dir = os.path.join(args.out_dir, "_generated_events")
        FX.write_fixtures(events_dir)

    spark = get_spark(app_name="cdc-run-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    if args.multi_topic:
        from .streaming.ingest_stream import start_multi_topic_ingest

        start_multi_topic_ingest(
            spark, events_dir, args.out_dir, tables=tuple(tables)
        )
        report = []
        for table in tables:
            m = {
                "table": table,
                "live_rows": materialize_latest(
                    spark, args.out_dir, table
                ).count(),
            }
            if args.asof_offset is not None:
                m["live_rows_asof"] = materialize_latest(
                    spark, args.out_dir, table, asof_offset=args.asof_offset
                ).count()
            report.append(m)
        print(json.dumps({"tables": report, "mode": "multi_topic"}))
        return 0

    def run_one(table: str) -> dict:
        metrics = ingest_table(
            spark, os.path.join(events_dir, f"{table}.jsonl"), table, args.out_dir
        )
        metrics["live_rows"] = materialize_latest(
            spark, args.out_dir, table
        ).count()
        if args.asof_offset is not None:
            metrics["live_rows_asof"] = materialize_latest(
                spark, args.out_dir, table, asof_offset=args.asof_offset
            ).count()
        if args.sketch_state:
            from .streaming.sketch_state import (
                read_sketch_summary,
                start_sketch_stream,
            )

            start_sketch_stream(spark, events_dir, table, args.out_dir)
            s = read_sketch_summary(spark, args.out_dir, table).collect()[0]
            metrics["sketch"] = {
                "n_rows": s["n_rows"],
                "approx_distinct_keys": s["approx_distinct_keys"],
                "p50": s["p50"],
                "p90": s["p90"],
                "p99": s["p99"],
            }
        if args.compact:
            from pyspark.sql import functions as F

            from .cdc.latest_state import compact_changelog
            from .cdc.parse import parse_events, read_event_file

            env = read_event_file(
                spark, os.path.join(events_dir, f"{table}.jsonl")
            )
            c = compact_changelog(parse_events(env, table))
            s = c.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("net_op") == "delete").cast("long")).alias(
                    "n_delete_markers"
                ),
                F.sum("n_events_folded").alias("n_events"),
            ).collect()[0]
            metrics["compact"] = {
                "n_keys": s.n_keys,
                "n_delete_markers": s.n_delete_markers,
                "fold_ratio": round(s.n_events / max(s.n_keys, 1), 3),
            }
        if args.agg_view:
            from .streaming.incremental_view import (
                VIEW_SPECS,
                read_view,
                start_view_stream,
            )

            if table in VIEW_SPECS:
                start_view_stream(spark, events_dir, table, args.out_dir)
                metrics["agg_view"] = sorted(
                    (
                        {k: (float(v) if hasattr(v, "as_tuple") else v)
                         for k, v in r.asDict().items()}
                        for r in read_view(spark, args.out_dir, table).collect()
                    ),
                    key=lambda d: str(d),
                )
        return metrics

    if args.parallel > 1:
        # one Spark job per table in flight concurrently — the scheduler
        # interleaves their stages across the executor cores (the
        # multi-topic analogue of Kafka consumer-group parallelism)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.parallel) as pool:
            report = list(pool.map(run_one, tables))
    else:
        report = [run_one(t) for t in tables]

    payload = {"tables": report}
    if args.gold_views:
        from .streaming.incremental_join_view import (
            read_join_view,
            start_join_view_stream,
        )
        from .streaming.incremental_order_lines_view import (
            read_order_lines_view,
            start_order_lines_view_stream,
        )

        def _json_rows(df):
            return sorted(
                (
                    {k: (str(v) if hasattr(v, "isoformat") else v)
                     for k, v in r.asDict().items()}
                    for r in df.collect()
                ),
                key=lambda d: str(d),
            )

        start_join_view_stream(spark, events_dir, args.out_dir)
        start_order_lines_view_stream(spark, events_dir, args.out_dir)
        payload["gold_customer_orders"] = _json_rows(
            read_join_view(spark, args.out_dir)
        )
        payload["gold_order_lines"] = _json_rows(
            read_order_lines_view(spark, args.out_dir)
        )

    if args.tablelog:
        from .sources import tablelog as TL
        from .streaming.tablelog_upsert import (
            read_live,
            start_tablelog_upsert_stream,
        )

        tl_report = []
        for t in tables:
            root = os.path.join(args.out_dir, "tablelog", t)
            start_tablelog_upsert_stream(
                spark, events_dir, t, root, args.out_dir
            )
            v = TL._latest_version(root)
            tl_report.append(
                {
                    "table": t,
                    "version": v,
                    "n_live_files": len(TL._live_files(root, v)),
                    "n_live_rows": read_live(spark, root, t).count(),
                    # DESCRIBE DETAIL (r9): size/DV-debt/spec/constraint
                    # facts for the maintenance operator's dashboard
                    "detail": TL.log_detail(root),
                    # maintenance PLAN (r10): what the policy would run
                    # (small-file bin-pack / DV purge / checkpoint /
                    # orphan vacuum) — metadata probes only; a deployment
                    # schedules log_maintenance(dry_run=False) on this
                    "maintenance_plan": TL.log_maintenance(
                        spark, root, dry_run=True
                    ),
                }
            )
        payload["tablelog"] = tl_report

    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
