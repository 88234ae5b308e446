"""Deterministic CDC change-event fixture generator (FIXTURES.md §B).

Reproduces the reference's wire format without Kafka/Debezium/Postgres:
one JSONL file per table-topic, each line a Kafka-style record envelope
  {"key": <json str>, "value": <json str|null>, "topic": ..,
   "partition": 0, "offset": N, "timestamp": <epoch ms>}
with the value already unwrapped to the after-image row (the
ExtractNewRecordState SMT shape, /root/reference/config/debezium-config.json:20-21)
and the two lossy Debezium encodings reproduced deliberately:
DECIMAL(10,2) as string, TIMESTAMP as epoch-µs long
(/root/reference/glue-jobs/kafka_to_s3_enhanced.py:110-139).

Scenarios covered (FIXTURES.md §B.3): initial snapshot, inserts, updates
(same PK re-emitted), deletes as null-value tombstones, malformed JSON,
plus enough events to exercise offset-resume and empty-increment paths.
Everything is seeded — two runs produce byte-identical files.
"""

from __future__ import annotations

import json
import os
import random

from ..catalog import CDC_PRIMARY_KEYS

TOPIC_PREFIX = "dbserver1.ecommerce"
BASE_TS_MS = 1_700_000_000_000  # fixed broker-append base time
BASE_DATE_US = 1_700_000_000_000_000  # epoch-µs base for order_date fields

#: Seed rows mirroring docker/postgres/init.sql:50-59 + runtime orders
#: (run_pipeline.sh:130-134).
_SNAPSHOT = {
    "customers": [
        {"customer_id": 1, "email": "john@example.com", "first_name": "John",
         "last_name": "Doe", "phone": "555-0101"},
        {"customer_id": 2, "email": "jane@example.com", "first_name": "Jane",
         "last_name": "Smith", "phone": "555-0102"},
        {"customer_id": 3, "email": "bob@example.com", "first_name": "Bob",
         "last_name": "Wilson", "phone": "555-0103"},
    ],
    "products": [
        {"product_id": 1, "product_name": "Laptop", "category": "Electronics",
         "price": "1299.99", "stock_quantity": 25},
        {"product_id": 2, "product_name": "Phone", "category": "Electronics",
         "price": "899.50", "stock_quantity": 40},
        {"product_id": 3, "product_name": "Desk", "category": "Furniture",
         "price": "349.00", "stock_quantity": 12},
        {"product_id": 4, "product_name": "Chair", "category": "Furniture",
         "price": "149.75", "stock_quantity": 30},
    ],
    "orders": [
        {"order_id": 1, "customer_id": 1, "order_date": BASE_DATE_US,
         "status": "pending", "total_amount": "1299.99",
         "shipping_address": "1 Main St"},
        {"order_id": 2, "customer_id": 2, "order_date": BASE_DATE_US + 60_000_000,
         "status": "pending", "total_amount": "899.50",
         "shipping_address": "2 Oak Ave"},
    ],
    "order_items": [
        {"order_item_id": 1, "order_id": 1, "product_id": 1, "quantity": 1,
         "unit_price": "1299.99", "subtotal": "1299.99"},
        {"order_item_id": 2, "order_id": 2, "product_id": 2, "quantity": 1,
         "unit_price": "899.50", "subtotal": "899.50"},
    ],
}

_STATUSES = ("pending", "processing", "shipped", "delivered", "cancelled")


def generate_table_events(
    table: str,
    n_inserts: int = 40,
    n_updates: int = 25,
    n_deletes: int = 5,
    n_malformed: int = 3,
    seed: int = 42,
) -> list[dict]:
    """Ordered event list (offset == list index) for one table-topic."""
    rng = random.Random(f"{seed}:{table}")
    pk = CDC_PRIMARY_KEYS[table]
    topic = f"{TOPIC_PREFIX}.{table}"
    rows: list[dict] = []
    live: dict[int, dict] = {}

    def rec(value, key_id, kind):
        return {
            "key": json.dumps({pk: key_id}),
            "value": value if value is None or isinstance(value, str)
            else json.dumps(value),
            "topic": topic,
            "partition": 0,
            "offset": len(rows),
            "timestamp": BASE_TS_MS + len(rows) * 1000 + rng.randint(0, 999),
            "_kind": kind,  # generator-side annotation, stripped on write
        }

    # 1. snapshot (op='r' world): seeded rows
    for row in _SNAPSHOT[table]:
        live[row[pk]] = dict(row)
        rows.append(rec(row, row[pk], "snapshot"))

    next_id = max(live) + 1

    def fresh_row(i: int) -> dict:
        if table == "customers":
            return {"customer_id": i, "email": f"user{i}@example.com",
                    "first_name": f"First{i}", "last_name": f"Last{i}",
                    "phone": f"555-{1000 + i}"}
        if table == "products":
            return {"product_id": i, "product_name": f"Product {i}",
                    "category": rng.choice(["Electronics", "Furniture", "Toys"]),
                    "price": f"{rng.randint(100, 99999) / 100:.2f}",
                    "stock_quantity": rng.randint(0, 100)}
        if table == "orders":
            return {"order_id": i, "customer_id": rng.randint(1, 3),
                    "order_date": BASE_DATE_US + i * 3_600_000_000,
                    "status": rng.choice(_STATUSES),
                    "total_amount": f"{rng.randint(1000, 500000) / 100:.2f}",
                    "shipping_address": f"{i} Elm St"}
        # FK fan-out across the full key ranges the orders/products
        # topics emit (ids 1-42 / 1-44): the gold rollup along the
        # second FK edge (cdc_gold_order_lines) needs lines spread over
        # many orders and products, including some whose parent later
        # gets a tombstone — the original 1-2/1-4 ranges collapsed the
        # gold table to two rows and never exercised a deleted parent.
        return {"order_item_id": i, "order_id": rng.randint(1, 42),
                "product_id": rng.randint(1, 44), "quantity": rng.randint(1, 5),
                "unit_price": f"{rng.randint(100, 99999) / 100:.2f}",
                "subtotal": f"{rng.randint(100, 99999) / 100:.2f}"}

    # 2. inserts
    for _ in range(n_inserts):
        row = fresh_row(next_id)
        live[next_id] = dict(row)
        rows.append(rec(row, next_id, "insert"))
        next_id += 1

    # 3. updates: re-emit an existing PK with changed fields
    for _ in range(n_updates):
        key_id = rng.choice(sorted(live))
        row = dict(live[key_id])
        if table == "orders":
            row["status"] = rng.choice(_STATUSES)
            row["total_amount"] = f"{rng.randint(1000, 500000) / 100:.2f}"
        elif table == "customers":
            row["phone"] = f"555-{rng.randint(2000, 9999)}"
        elif table == "products":
            row["stock_quantity"] = rng.randint(0, 100)
        else:
            row["quantity"] = rng.randint(1, 9)
        live[key_id] = dict(row)
        rows.append(rec(row, key_id, "update"))

    # 4. deletes: null-value tombstones (drop.tombstones=false retains them,
    #    debezium-config.json:22; the reference never consumes these — U3)
    for _ in range(n_deletes):
        key_id = rng.choice(sorted(live))
        del live[key_id]
        rows.append(rec(None, key_id, "tombstone"))

    # 5. malformed values → from_json null → quarantine path (U5)
    for i in range(n_malformed):
        rows.append(rec('{"truncated": ', 10_000 + i, "malformed"))

    return rows


def expected_live_rows(events: list[dict], table: str) -> dict[int, dict]:
    """Replay the event list by hand: the latest-state oracle for tests."""
    pk = CDC_PRIMARY_KEYS[table]
    live: dict[int, dict] = {}
    for e in events:
        if e["_kind"] == "malformed":
            continue
        key_id = json.loads(e["key"])[pk]
        if e["value"] is None:
            live.pop(key_id, None)
        else:
            live[key_id] = json.loads(e["value"])
    return live


def write_drift_fixture(out_dir: str) -> str:
    """Write <out_dir>/orders_drift.jsonl: the orders topic with SCHEMA
    DRIFT injected — extra payload fields Debezium would start emitting
    after a source-side ALTER TABLE (loyalty_tier on offsets ≡3 mod 7,
    discount_code on offsets ≡5 mod 11). Injection is offset-keyed, so
    the file is byte-identical on every call like the base fixtures;
    the shared orders.jsonl is untouched (its oracles depend on exact
    bytes)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "orders_drift.jsonl")
    with open(path, "w") as f:
        for e in generate_table_events("orders"):
            e = {k: v for k, v in e.items() if k != "_kind"}
            v = e["value"]
            if isinstance(v, str):
                try:
                    row = json.loads(v)
                except ValueError:
                    row = None
                if isinstance(row, dict):
                    off = e["offset"]
                    if off % 7 == 3:
                        row["loyalty_tier"] = "gold"
                    if off % 11 == 5:
                        row["discount_code"] = f"DC{off}"
                    e["value"] = json.dumps(row)
            f.write(json.dumps(e))
            f.write("\n")
    return path


def write_fixtures(
    out_dir: str, tables: tuple[str, ...] = tuple(CDC_PRIMARY_KEYS), **kwargs
) -> dict[str, str]:
    """Write <out_dir>/<table>.jsonl per table; returns table -> path."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for table in tables:
        events = generate_table_events(table, **kwargs)
        path = os.path.join(out_dir, f"{table}.jsonl")
        with open(path, "w") as f:
            for e in events:
                f.write(json.dumps({k: v for k, v in e.items() if k != "_kind"}))
                f.write("\n")
        paths[table] = path
    return paths
