"""Incrementally-maintained gold view along the reference schema's
SECOND FK edge — order_items⋈products rolled up to order level (the
maintained twin of ``cdc.queries.cdc_gold_order_lines``; FK edges:
docker/postgres/init.sql:41-42).

Same recompute-affected-keys strategy as ``incremental_join_view``
(customers⋈orders), with the one genuinely new IVM shape this edge
adds: **dim-side fan-out**. A change in the PRODUCTS stream (category
rewrite, tombstone) invalidates every order whose LIVE lines reference
the changed product — the affected-key set is not in the batch itself
but discovered by a semi-join of the item key-state against the batch's
product ids. The classic star-schema IVM asymmetry:

  item batch:    affected order_ids = new images' order_id ∪ old
                 images' order_id (an item UPDATE can move a line
                 between orders: BOTH orders' rollups change);
  product batch: affected order_ids = item_keys(live).filter(
                 product_id ∈ batch's changed product ids).order_id —
                 a fan-out join, batch×(referencing lines)-sized.

  state:  item_keys (order_item_id → order_id, product_id, quantity,
                     subtotal + position)                       — narrow
          prod_keys (product_id → category + position)          — narrow
          gold      (one row per order WITH live lines + last_batch_id)

Per-batch cost ∝ |batch| + the affected orders' state slice. The
product-side fan-out is bounded by the referencing-line count of the
changed products — at 100 TB both key-states are bucketed (item_keys by
order_id AND a product_id secondary projection; prod_keys by pk) so the
fan-out semi-join and the recompute point-lookups are bucket-pruned.

Crash model and batch-id guard are inherited verbatim from
``incremental_join_view`` (key-state swaps first, gold swap with
``last_batch_id`` last; replays merge idempotently via the >=-tie rule;
``batch_id`` must be one monotone sequence across BOTH topics — run one
multiplexed stream, not two).

Gold membership rule: an order exists in gold iff it has >= 1 live
line — recomputing an affected order that lost its last line yields no
row, and the affected-keyed anti-join removes its stale gold row; a
tombstoned PRODUCT does not remove lines (a sold line referencing a
retired product is still a sold line) — its lines fall back to NULL
category via the left join, exactly like the batch gold query.

Oracle: the two-replay SQL (cdc.queries.CDC_GOLD_ORDER_LINES_SQL) —
maintained view ≡ full recompute.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc import parse as P
from .incremental_join_view import (
    _batch_final,
    _merge_keys,
    _path,
    _read_or_empty,
)
from .upsert import _recover_state, _swap

_ITEM_DDL = (
    "pk INT, order_id INT, product_id INT, quantity INT, "
    "subtotal DECIMAL(10,2), is_tombstone BOOLEAN, partition INT, "
    "kafka_offset LONG"
)
_PROD_DDL = (
    "pk INT, category STRING, is_tombstone BOOLEAN, partition INT, "
    "kafka_offset LONG"
)
_GOLD_DDL = (
    "order_id INT, n_lines LONG, total_units LONG, "
    "order_subtotal DECIMAL(38,2), n_products LONG, n_categories LONG, "
    "last_batch_id LONG"
)


def _narrow(delta: DataFrame, topic: str) -> DataFrame:
    if topic == "order_items":
        return delta.select(
            "pk",
            "order_id",
            "product_id",
            "quantity",
            "subtotal",
            "is_tombstone",
            "partition",
            "kafka_offset",
        )
    return delta.select(
        "pk", "category", "is_tombstone", "partition", "kafka_offset"
    )


def apply_order_lines_batch(
    spark: SparkSession,
    batch_env: DataFrame,
    topic: str,
    out_dir: str,
    batch_id: int,
) -> None:
    """Fold one micro-batch of ``topic`` envelope rows into the
    order-lines gold view (see module docstring for the affected-key
    rules; ``batch_id`` = the one monotone epoch sequence)."""
    assert topic in ("order_items", "products"), topic
    ipath = _path(out_dir, "lines_item_keys")
    ppath = _path(out_dir, "lines_prod_keys")
    gpath = _path(out_dir, "lines_gold_view")
    for p in (ipath, ppath, gpath):
        _recover_state(p)

    if os.path.exists(gpath):
        last = (
            spark.read.parquet(gpath).agg(F.max("last_batch_id")).collect()[0][0]
        )
        if last is not None and batch_id <= last:
            return  # fully-applied batch replayed after the gold swap

    delta = P.project_changelog(
        P.parse_events(batch_env, topic), topic
    ).filter(~F.col("is_malformed"))
    final = _batch_final(_narrow(delta, topic))

    items = _read_or_empty(spark, ipath, _ITEM_DDL)
    prods = _read_or_empty(spark, ppath, _PROD_DDL)

    if topic == "order_items":
        won, merged = _merge_keys(final, items)
        # fact-side rule: both the landing order and (for moves/deletes)
        # the departing order recompute; tombstone rows carry NULL new
        # fields, their old image supplies the departing order id
        affected = (
            won.select("order_id")
            .unionByName(won.select(F.col("o_order_id").alias("order_id")))
            .filter(F.col("order_id").isNotNull())
        )
        items = merged
        topic_path, topic_state = ipath, items
    else:
        won, merged = _merge_keys(final, prods)
        # dim-side fan-out rule: every order with a LIVE line on a
        # changed product recomputes (category rewrite or product
        # tombstone changes that order's n_categories / NULL fallback).
        # The product pk never changes, so old ∪ new ids == won.pk.
        changed = won.select("pk").distinct()
        affected = (
            items.filter(~F.col("is_tombstone"))
            .join(
                F.broadcast(changed),
                items["product_id"] == changed["pk"],
                "left_semi",
            )
            .select("order_id")
        )
        prods = merged
        topic_path, topic_state = ppath, prods
    affected = affected.distinct().localCheckpoint(eager=True)

    # recompute gold rows for the affected orders from MERGED state:
    # point-lookup joins, affected-sized (broadcast the affected set)
    live_lines = (
        items.filter(~F.col("is_tombstone"))
        .join(F.broadcast(affected), "order_id", "left_semi")
        .select("order_id", "product_id", "quantity", "subtotal")
    )
    live_prods = prods.filter(~F.col("is_tombstone")).select(
        F.col("pk").alias("product_id"), "category"
    )
    recomputed = (
        live_lines.join(live_prods, "product_id", "left")
        .groupBy("order_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("quantity").cast("long").alias("total_units"),
            F.sum("subtotal").cast("decimal(38,2)").alias("order_subtotal"),
            F.countDistinct("product_id").alias("n_products"),
            F.countDistinct("category").alias("n_categories"),
        )
        .withColumn("last_batch_id", F.lit(int(batch_id)))
    )

    gold = _read_or_empty(spark, gpath, _GOLD_DDL)
    new_gold = gold.join(
        F.broadcast(affected), "order_id", "left_anti"
    ).unionByName(recomputed)
    new_gold = new_gold.localCheckpoint(eager=True)

    # key-state first, gold (with the batch-id guard) last — the crash
    # window between the two replays idempotently (module docstring)
    _swap(topic_state.coalesce(1), topic_path, batch_id)
    _swap(new_gold.coalesce(1), gpath, batch_id)


def start_order_lines_view_stream(
    spark: SparkSession, event_dir: str, out_dir: str
):
    """Drain available order_items/products change events through the
    order-lines maintainer via ONE multiplexed stream (see
    incremental_join_view.start_multiplexed_view_stream for the epoch →
    per-topic sub-id routing and its crash/replay argument)."""
    from .incremental_join_view import start_multiplexed_view_stream

    return start_multiplexed_view_stream(
        spark,
        event_dir,
        out_dir,
        ("order_items", "products"),
        apply_order_lines_batch,
        "_checkpoints_order_lines_view",
    )


def read_order_lines_view(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_path(out_dir, "lines_gold_view")).select(
        "order_id",
        "n_lines",
        "total_units",
        F.col("order_subtotal").cast("double").alias("order_subtotal"),
        "n_products",
        "n_categories",
    )


# ---------------------------------------------------------------------------
# Registry adapter: replay both topics' changelogs in interleaved
# offset-split batches through the maintainer; emit the final view.
# ---------------------------------------------------------------------------

def cdc_incremental_order_lines_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incrementally-maintained order_items⋈products gold view, built by
    FOUR interleaved delta applications (items₀, products₀, items₁,
    products₁) — the oracle recomputes the identical view from both full
    changelogs, proving the dim-fan-out maintenance ≡ recompute. Both
    fixture streams carry tombstones, so item deletes (line removal) and
    product deletes (NULL-category fallback) are exercised in-window.

    sf_dir is unused (CDC input is the fixture stream); kept for the
    uniform queries() signature."""
    import tempfile

    from ..cdc.queries import ensure_fixtures

    d = ensure_fixtures()
    out = tempfile.mkdtemp(prefix="cdc_order_lines_view_")
    try:
        env, mid = {}, {}
        for topic in ("order_items", "products"):
            env[topic] = P.read_event_file(
                spark, os.path.join(d, f"{topic}.jsonl")
            )
            mid[topic] = (
                env[topic].agg(F.expr("percentile(offset, 0.5)")).collect()[0][0]
            )
        halves = [
            ("order_items", F.col("offset") <= mid["order_items"]),
            ("products", F.col("offset") <= mid["products"]),
            ("order_items", F.col("offset") > mid["order_items"]),
            ("products", F.col("offset") > mid["products"]),
        ]
        for bid, (topic, pred) in enumerate(halves):
            apply_order_lines_batch(
                spark, env[topic].filter(pred), topic, out, bid
            )
        rows = read_order_lines_view(spark, out).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    view = spark.createDataFrame(
        rows,
        "order_id INT, n_lines LONG, total_units LONG, "
        "order_subtotal DOUBLE, n_products LONG, n_categories LONG",
    )
    return view.orderBy("order_id")
