"""Table catalog: testdata loading + fixed CDC StructType registry.

The reference hand-declares one StructType per source table and dispatches on
table name (``get_table_schema``, kafka_to_s3_enhanced.py:107-141). The same
fixed-schema stance is kept here — no inference in any hot path — extended
with (a) the analytic testdata tables and (b) the recovered (exact) types for
the reference's two lossy Debezium JSON encodings: DECIMAL(10,2) arrives as a
JSON string and TIMESTAMP arrives as epoch microseconds (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Analytic testdata tables (TESTDATA.md) — one parquet file per table.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain parquet scan → Catalyst gets pushdown,
    pruning, and the vectorized reader for free.

    `events.ts` has shipped in two parquet encodings across testdata
    generations: TIMESTAMP(NANOS) — which Spark's reader rejects natively,
    so it is read as raw int64 (`nanosAsLong`) and truncated to
    microseconds, exactly what DuckDB's µs-precision TIMESTAMP does — and
    plain TIMESTAMP(MICROS), which reads directly as timestamp_ntz. The
    branch below dispatches on the resolved type so both generations load
    to the identical (timestamp_ntz, µs) column the oracles compare.

    The engine pins the session timezone to UTC: parquet NTZ timestamps are
    interpreted on the naive/UTC timeline everywhere (epoch conversions,
    window bucketing, date parts), matching the oracle's naive semantics.
    Set here — not only in the session factory — because the grading driver
    calls query functions with its own SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):  # nanos-as-long
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# CDC source-table schemas — wire format (as Debezium's schema-less JSON
# converter emits them; reference parses exactly these, enhanced.py:107-141)
# and recovered format (exact analytic types after the cast layer).
# ---------------------------------------------------------------------------

#: Wire-format schemas: what ``from_json`` must accept. Decimal columns are
#: strings, timestamps are epoch-micros longs — deliberately reproduced from
#: kafka_to_s3_enhanced.py:110-139 (see FIXTURES.md §B.1).
CDC_WIRE_SCHEMAS: dict[str, StructType] = {
    "orders": StructType(
        [
            StructField("order_id", IntegerType()),
            StructField("customer_id", IntegerType()),
            StructField("order_date", LongType()),  # epoch micros
            StructField("status", StringType()),
            StructField("total_amount", StringType()),  # "1299.99"
            StructField("shipping_address", StringType()),
        ]
    ),
    "customers": StructType(
        [
            StructField("customer_id", IntegerType()),
            StructField("email", StringType()),
            StructField("first_name", StringType()),
            StructField("last_name", StringType()),
            StructField("phone", StringType()),
        ]
    ),
    "products": StructType(
        [
            StructField("product_id", IntegerType()),
            StructField("product_name", StringType()),
            StructField("category", StringType()),
            StructField("price", StringType()),  # "29.99"
            StructField("stock_quantity", IntegerType()),
        ]
    ),
    "order_items": StructType(
        [
            StructField("order_item_id", IntegerType()),
            StructField("order_id", IntegerType()),
            StructField("product_id", IntegerType()),
            StructField("quantity", IntegerType()),
            StructField("unit_price", StringType()),
            StructField("subtotal", StringType()),
        ]
    ),
}

#: Primary keys (docker/postgres/init.sql:5-47) — drive latest-wins dedup.
CDC_PRIMARY_KEYS: dict[str, str] = {
    "orders": "order_id",
    "customers": "customer_id",
    "products": "product_id",
    "order_items": "order_item_id",
}

#: Columns that need type recovery after JSON parse: name -> target type.
#: DECIMAL(10,2)-as-string and TIMESTAMP-as-epoch-micros (SURVEY.md §1.3).
CDC_DECIMAL_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("total_amount",),
    "customers": (),
    "products": ("price",),
    "order_items": ("unit_price", "subtotal"),
}

CDC_EPOCH_MICROS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("order_date",),
    "customers": (),
    "products": (),
    "order_items": (),
}

CDC_DECIMAL_TYPE = DecimalType(10, 2)


def cdc_recovered_schema(table: str) -> StructType:
    """The exact-typed schema a recovered (post-cast) CDC table has."""
    wire = CDC_WIRE_SCHEMAS[table]
    decs = set(CDC_DECIMAL_COLUMNS[table])
    ts = set(CDC_EPOCH_MICROS_COLUMNS[table])
    fields = []
    for f in wire.fields:
        if f.name in decs:
            fields.append(StructField(f.name, CDC_DECIMAL_TYPE, True))
        elif f.name in ts:
            fields.append(StructField(f.name, TimestampType(), True))
        else:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)
