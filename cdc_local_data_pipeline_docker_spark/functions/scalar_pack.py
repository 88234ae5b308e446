"""Scalar function packs: string, date/time, math, array, JSON.

The reference's only scalar work is binary→string casts and aliases
(kafka_to_s3_enhanced.py:158-190); the engine declares the full built-in
scalar surface (SURVEY.md §2.C "Scalar fns"). Each pack is one map-only
query over a testdata table with a DuckDB oracle twin — every expression is
a deterministic function of ints/strings (or a single double op), so values
hash-match exactly.

These all stay inside whole-stage codegen: no shuffle except final ORDER BY
(which exists only to make small results readable; the driver compare is
order-insensitive anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def fn_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions over customer: case, substring, pad, trim, replace,
    position, concat, regexp extraction."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("upper_name"),
            F.lower("c_mktsegment").alias("lower_segment"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
            F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
                "replaced"
            ),
            F.instr("c_name", "#").alias("hash_pos"),
            F.reverse("c_mktsegment").alias("rev_segment"),
        )
        .orderBy("c_custkey")
    )


FN_STRING_PACK_SQL = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_mktsegment) AS lower_segment,
       length(c_name) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       COALESCE(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
       replace(c_name, 'Customer', 'Cust') AS replaced,
       instr(c_name, '#') AS hash_pos,
       reverse(c_mktsegment) AS rev_segment
FROM customer
ORDER BY c_custkey
"""


def fn_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions over orders: parts, truncation, arithmetic, and
    the reference's epoch-micros encoding (enhanced.py:113: TIMESTAMP wired
    as LongType epoch-µs) roundtripped both directions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.hour("o_orderdate").alias("order_hour"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.to_date("o_orderdate").alias("order_date_only"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_95"
            ),
            F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
            F.last_day("o_orderdate").alias("month_end"),
            # epoch-µs roundtrip — the CDC wire encoding (SURVEY.md §1.3).
            # Parquet yields TIMESTAMP_NTZ; cast to TIMESTAMP (session tz is
            # pinned UTC) since unix_micros requires the tz-aware type.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_us"),
            F.timestamp_micros(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).cast("timestamp_ntz").alias("ts_roundtrip"),
        )
        .orderBy("o_orderkey")
    )


FN_DATE_PACK_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       hour(o_orderdate) AS order_hour,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) AS order_date_only,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         AS days_since_95,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       last_day(o_orderdate) AS month_end,
       epoch_us(o_orderdate) AS epoch_us,
       make_timestamp(epoch_us(o_orderdate)) AS ts_roundtrip
FROM orders
ORDER BY o_orderkey
"""


def fn_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions over lineitem.

    Hash-exactness constraint: only operations that IEEE 754 defines as
    correctly rounded (+,-,*,/,sqrt) or that are integer-valued appear in
    the output — transcendentals (log/exp/pow) are 1-ULP library-dependent
    and would flake the oracle compare, so squaring is written as x*x."""
    li = load_table(spark, sf_dir, "lineitem")
    tax1 = F.col("l_tax") + 1.0
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
            F.round("l_extendedprice", 1).alias("price_round1"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (tax1 * tax1).alias("tax_factor_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod7"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
            F.sign(F.col("l_discount") - F.col("l_tax")).cast("double").alias(
                "disc_vs_tax"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


FN_MATH_PACK_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_disc_delta,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       round(l_extendedprice, 1) AS price_round1,
       sqrt(l_quantity) AS qty_sqrt,
       (l_tax + 1.0) * (l_tax + 1.0) AS tax_factor_sq,
       l_orderkey % 7 AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(CASE WHEN l_discount - l_tax > 0 THEN 1.0
                 WHEN l_discount - l_tax < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE)
         AS disc_vs_tax
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


def fn_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over documents' token arrays: construction, access,
    slicing, sorting, membership, set algebra, higher-order transform."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_toks"),
            F.element_at(toks, 1).alias("first_tok"),
            F.element_at(toks, -1).alias("last_tok"),
            # array results are emitted as joined strings: the driver's
            # pandas canonicalizer cannot hash list cells
            F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
            F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias(
                "sorted_vocab"
            ),
            F.array_contains(toks, "spark").alias("has_spark"),
            F.array_position(toks, "data").alias("data_pos"),
            F.expr(
                "array_join(transform(slice(split(text, ' '), 1, 3),"
                " t -> upper(t)), ' ')"
            ).alias("head3_upper"),
            F.expr("size(filter(split(text, ' '), t -> length(t) > 4))").alias(
                "n_long_toks"
            ),
        )
        .orderBy("doc_id")
    )


FN_ARRAY_PACK_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_toks,
       string_split(text, ' ')[1] AS first_tok,
       string_split(text, ' ')[-1] AS last_tok,
       array_to_string((string_split(text, ' '))[1:5], ' ') AS head5,
       array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
         AS sorted_vocab,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       COALESCE(list_position(string_split(text, ' '), 'data'), 0) AS data_pos,
       array_to_string(list_transform((string_split(text, ' '))[1:3],
                                      t -> upper(t)), ' ')
         AS head3_upper,
       len(list_filter(string_split(text, ' '), t -> length(t) > 4))
         AS n_long_toks
FROM documents
ORDER BY doc_id
"""


def fn_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over events.props: path extraction (string + typed),
    schema-applied parse (`from_json` — the reference's core primitive,
    enhanced.py:160), and key listing."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_int"),
            F.get_json_object("props", "$.missing").alias("missing_path"),
            F.from_json("props", "k LONG").getField("k").alias("k_parsed"),
            # joined string, not array — canon-safe at the query boundary
            F.array_join(F.json_object_keys("props"), ",").alias("prop_keys"),
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
        )
        .orderBy("event_id")
    )


FN_JSON_PACK_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.missing') AS missing_path,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
       array_to_string(json_keys(props), ',') AS prop_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
ORDER BY event_id
"""


def fn_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions over per-doc token counts: build a map with
    map_from_entries over an aggregated (token, count) struct array, then
    interrogate it (size, keys, lookup). Output is map-free (sorted arrays
    + scalars) so the comparison is representation-independent — DuckDB
    builds the same answers straight from the grouped counts."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    with_map = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("tok", "cnt")))
        ).alias("tok_map")
    )
    return with_map.select(
        "doc_id",
        F.size("tok_map").alias("n_distinct_tokens"),
        F.array_join(F.array_sort(F.map_keys("tok_map")), " ").alias("vocab"),
        F.coalesce(F.element_at("tok_map", "data"), F.lit(0).cast("long")).alias(
            "count_of_data"
        ),
        F.expr(
            "aggregate(map_values(tok_map), 0L, (acc, x) -> acc + x)"
        ).alias("n_tokens"),
    ).orderBy("doc_id")


FN_MAP_PACK_SQL = """
WITH counts AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       COUNT(*) AS n_distinct_tokens,
       array_to_string(list_sort(list(tok)), ' ') AS vocab,
       COALESCE(MAX(CASE WHEN tok = 'data' THEN cnt END), 0) AS count_of_data,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


def fn_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling: CASE chains, coalesce, nullif,
    nvl2-style branching, boolean algebra — over orders."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 50000, "high")
            .when(F.col("o_totalprice") > 10000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(
                F.nullif("o_orderstatus", F.lit("O")), F.lit("open")
            ).alias("status_or_open"),
            (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
             & (F.col("o_orderstatus") == "O")).alias("hot_open"),
            F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")).alias(
                "even_key_price"
            ),
        )
        .orderBy("o_orderkey")
    )


FN_CONDITIONAL_PACK_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 50000 THEN 'high'
            WHEN o_totalprice > 10000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
       (o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'O')
         AS hot_open,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS even_key_price
FROM orders
ORDER BY o_orderkey
"""
