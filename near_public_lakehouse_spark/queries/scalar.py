"""Scalar-function and set-operation coverage (SURVEY §2.10, §2.8, P2/P3,
G3/G5): string/binary/date/JSON/conditional functions, SELECT * EXCEPT,
transform HOFs, UNION/INTERSECT/EXCEPT — each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table


@query(
    "string_functions",
    tags=("§2.10-strings",),
    oracle="""
SELECT c_custkey,
       lower(c_name) AS name_lower,
       substr(c_name, 10, 9) AS name_digits,
       c_name || ':' || c_mktsegment AS name_seg,
       length(c_name) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       (c_name LIKE 'Customer%') AS is_customer_prefix,
       contains(c_name, '000042') AS has_42,
       trim('  ' || c_mktsegment || ' ') AS seg_trim
FROM customer
ORDER BY c_custkey
LIMIT 200
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: lower/substring/concat/length/replace/like/contains/
    trim — the silver layer's string ops (Silver Lake Mainnet.sql:227,
    235-240, 544-557; SCD tables.sql:134)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.lower("c_name").alias("name_lower"),
            F.substring("c_name", 10, 9).alias("name_digits"),
            F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
            F.length("c_name").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
            F.col("c_name").like("Customer%").alias("is_customer_prefix"),
            F.col("c_name").contains("000042").alias("has_42"),
            F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


@query(
    "scalar_binary_functions",
    tags=("§2.10-binary",),
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       base64(encode(substr(text, 1, 12))) AS head_b64,
       decode(from_base64(base64(encode(substr(text, 1, 12))))) AS head_roundtrip,
       upper(hex(encode(substr(text, 1, 4)))) AS head_hex
FROM documents
ORDER BY doc_id
LIMIT 100
""",
)
def scalar_binary_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary surface: md5/sha256/base64/unbase64/hex — contract-code
    hashing and args decoding (Silver Lake Mainnet.sql:227,273,652)."""
    d = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 12)
    b64 = F.base64(head.cast("binary"))
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2(F.col("text"), 256).alias("text_sha256"),
            b64.alias("head_b64"),
            F.unbase64(b64).cast("string").alias("head_roundtrip"),
            F.upper(F.hex(F.substring("text", 1, 4).cast("binary"))).alias("head_hex"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "scalar_date_functions",
    tags=("§2.10-date",),
    oracle="""
SELECT year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       count(*) AS n_orders,
       count(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
FROM orders
GROUP BY order_year, order_month, month_start
ORDER BY order_year, order_month
""",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date surface: year/month/date_trunc — the reference's date math
    (§2.10: date_trunc at NEAR Public Datasets.py:81, ::date everywhere)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct(F.to_date("o_orderdate")).alias("active_days"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "try_cast_defensive",
    tags=("§2.10-conditional", "P6"),
    oracle="""
SELECT event_type,
       count(TRY_CAST(event_type AS BIGINT)) AS numeric_types,
       count(CASE WHEN regexp_matches(coalesce(
                    CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END, ''),
                    '^-?[0-9]+$')
                  THEN 1 END) AS numeric_props,
       count(CASE WHEN NOT regexp_matches(coalesce(
                    CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.missing') END, ''),
                    '^-?[0-9]+$')
                  THEN 1 END) AS null_extractions
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def try_cast_defensive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defensive parsing: try_cast never fails the pipeline
    (SCD tables.sql:104; SURVEY §5 defensive-parsing inventory)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.try_to_number(F.col("event_type"), F.lit("999999"))).alias(
                "numeric_types"
            ),
            # the integer regex pins the cast domain on both engines:
            # Spark's non-ANSI try_cast truncates '0.5' to 0 while
            # DuckDB's rounds it to 1 (r15 differential fuzz) — an
            # integer-shaped check is the deterministic common ground
            F.count(
                F.when(
                    F.expr("get_json_object(props, '$.k')").rlike("^-?[0-9]+$"), 1
                )
            ).alias("numeric_props"),
            F.count(
                F.when(
                    ~F.coalesce(
                        F.expr("get_json_object(props, '$.missing')").rlike(
                            "^-?[0-9]+$"
                        ),
                        F.lit(False),
                    ),
                    1,
                )
            ).alias("null_extractions"),
        )
        .orderBy("event_type")
    )


@query(
    "select_except",
    tags=("P2",),
    oracle="SELECT * EXCLUDE (text) FROM documents ORDER BY doc_id LIMIT 100",
)
def select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 `SELECT * EXCEPT(...)` (Epochs pipeline :171,174,305,...) — the
    DataFrame-side spelling is `.drop`, which prunes identically."""
    d = load_table(spark, sf_dir, "documents")
    return d.drop("text").orderBy("doc_id").limit(100)


@query(
    "transform_hof",
    tags=("G5",),
    oracle="""
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id,
       CASE WHEN toks IS NULL THEN NULL
            ELSE coalesce(array_to_string(list_transform(toks,
                   t -> upper(t) || '(' || CAST(length(t) AS VARCHAR) || ')'), ' '), '')
       END AS annotated,
       CASE WHEN toks IS NULL THEN NULL
            WHEN len(toks) = 0 THEN 0
            ELSE list_reduce(list_transform(toks, t -> length(t)), (a, b) -> a + b)
       END AS total_token_chars
FROM t
ORDER BY doc_id
LIMIT 100
""",
)
def transform_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 higher-order TRANSFORM with per-element rebuild (Silver Lake
    Testnet.sql:81-111 rebuilds structs per array element the same way),
    plus an aggregate fold."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    annotated = F.array_join(
        F.transform(
            toks,
            lambda t: F.concat(F.upper(t), F.lit("("), F.length(t).cast("string"), F.lit(")")),
        ),
        " ",
    )
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("int")),
        F.lit(0),
        lambda a, b: a + b,
    )
    return (
        d.select("doc_id", annotated.alias("annotated"), total.alias("total_token_chars"))
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "union_label_split",
    tags=("§2.8-union",),
    oracle="""
SELECT o_orderkey, tier,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT o_orderkey, 'high' AS tier, o_totalprice FROM orders WHERE o_totalprice >= 300000
  UNION ALL
  SELECT o_orderkey, 'low' AS tier, o_totalprice FROM orders WHERE o_totalprice < 10000
)
ORDER BY o_orderkey
""",
)
def union_label_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of labeled slices (the un-fused spelling of the G4
    double-entry emit; unionByName keeps column alignment by name)."""
    o = load_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") >= 300000).select(
        "o_orderkey", F.lit("high").alias("tier"), F.col("o_totalprice").cast("double")
    )
    low = o.filter(F.col("o_totalprice") < 10000).select(
        "o_orderkey", F.lit("low").alias("tier"), F.col("o_totalprice").cast("double")
    )
    return high.unionByName(low).orderBy("o_orderkey")


@query(
    "intersect_except_customers",
    tags=("§2.8-intersect",),
    oracle="""
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
ORDER BY c_custkey
""",
)
def intersect_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both finished and open orders. Spark plans
    this as a left-semi join after aggregate — same as the SQL."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return f.intersect(op).orderBy("c_custkey")


@query(
    "customers_without_orders",
    tags=("§2.8-except",),
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
ORDER BY c_custkey
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (anti-join shape): customers that never ordered."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct().orderBy("c_custkey")


@query(
    "json_object_keys_explode",
    tags=("G3",),
    oracle="""
SELECT k AS prop_key, count(*) AS n_events
FROM (SELECT unnest(CASE WHEN json_valid(props) THEN json_keys(props) END) AS k
      FROM events)
GROUP BY k
ORDER BY k
""",
)
def json_object_keys_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 `explode(json_object_keys(...))` — dynamic JSON keys to rows
    (NEAR Social.sql:63-71)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.explode(F.json_object_keys("props")).alias("prop_key"))
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("prop_key")
    )


@query(
    "scalar_conditional_min_heights",
    tags=("A3",),
    oracle="""
SELECT o_custkey,
       CAST(min(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END) AS DATE)
         AS first_finished_date,
       CAST(min(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END) AS DATE)
         AS first_open_date,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def scalar_conditional_min_heights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 pivot-style conditional MIN (the create/delete-height extraction,
    Aggregated Circulating Supply Pipeline.py:110-113)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate")))
            .cast("date")
            .alias("first_finished_date"),
            F.min(F.when(F.col("o_orderstatus") == "O", F.col("o_orderdate")))
            .cast("date")
            .alias("first_open_date"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@query(
    "order_status_rollup",
    tags=("rollup", "beyond-reference"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
""",
)
def order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status, priority) -> (status) -> grand
    total, with grouping_id disambiguating real NULLs from rolled-up
    levels. Beyond the reference's surface (SURVEY notes grouping sets
    absent) but table stakes for an analytics engine. Partial aggregation
    applies per grouping set; one shuffle."""
    from near_public_lakehouse_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    # The () grouping set is a separate global aggregate, not rollup's
    # own grand-total row: ANSI (and DuckDB) emit the grand total even
    # over EMPTY input, while Spark's rollup emits zero rows there (r15
    # differential fuzz, empty-table class). Excluding rollup's gid=3 row
    # and unioning the always-1-row agg is identical on non-empty input.
    levels = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .filter(F.col("gid") != 3)
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )
    total = o.agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(3).cast("bigint").alias("gid"),
        "n_orders",
        "total_price",
    )
    return levels.unionByName(total).orderBy(
        "gid", "o_orderstatus", "o_orderpriority"
    )


@query(
    "status_segment_cube",
    tags=("cube", "beyond-reference"),
    oracle="""
SELECT o_orderstatus, c_mktsegment,
       GROUPING(o_orderstatus) * 2 + GROUPING(c_mktsegment) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
ORDER BY gid, o_orderstatus, c_mktsegment
""",
)
def status_segment_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, segment): all four grouping sets in one pass —
    the cross-dimensional completion of order_status_rollup. grouping_id
    separates rolled-up levels from real NULLs; one shuffle, partial aggs
    expand per grouping set map-side."""
    from near_public_lakehouse_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    # () grouping set via a separate global aggregate — same ANSI
    # empty-input reasoning as order_status_rollup (r15 fuzz finding).
    levels = (
        joined.cube("o_orderstatus", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .filter(F.col("gid") != 3)
        .select("o_orderstatus", "c_mktsegment", "gid", "n_orders", "total_price")
    )
    total = joined.agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(3).cast("bigint").alias("gid"),
        "n_orders",
        "total_price",
    )
    return levels.unionByName(total).orderBy(
        "gid", "o_orderstatus", "c_mktsegment"
    )
