"""Core analytical queries: projections/filters (SURVEY §2.3), equi- and
theta-joins (§2.4), aggregations (§2.5) over the TPC-H-ish testdata.

Each query exists twice — once as idiomatic DataFrame code (what the engine
runs), once as ANSI SQL (what the DuckDB oracle runs) — with identical
column aliases. Money math follows the engine's exactness rule: DECIMAL
inside the aggregate, DOUBLE only on the result (functions/numeric.py),
mirroring the reference's u128-as-decimal discipline
(FT and NFT events.py:65-67; BQ Writer Stream.py:47-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.numeric import davg, dsum
from near_public_lakehouse_spark.functions.frames import inline_rows_df
from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table


def _dec(c: str, p: int = 18, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


# Exact line revenue: decimal in, decimal out (no float drift at any scale).
def _revenue():
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "pricing_summary",
    bench=True,
    tags=("A4", "A5", "P1"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum({REV_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({REV_SQL} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan grouped aggregate with 8 aggregates.

    Scale notes: single shuffle on a 6-value grouping key; partial (map-side)
    aggregation makes the shuffle tiny regardless of input size. The filter
    and 7-column projection push to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(_revenue() * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "top_revenue_orders",
    bench=True,
    tags=("J5", "P7"),
    oracle=f"""
SELECT l_orderkey,
       CAST(sum({REV_SQL}) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '2000-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '2000-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> grouped top-k.

    Scale notes: `customer` filtered on segment is ~1/5 of an already-small
    dim — Spark broadcasts it (AQE demotes to broadcast-hash under the
    10 MB default; we hint explicitly since at sf100 customer is ~2 GB but
    the filtered projection of (c_custkey) stays broadcastable). Top-k is
    TakeOrderedAndProject — no global sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("2000-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("2000-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "regional_supplier_revenue",
    bench=True,
    tags=("J5", "J6"),
    oracle=f"""
SELECT n_name,
       CAST(sum({REV_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('EUROPE', 'ASIA')
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a local-supplier equality.

    Scale notes: region/nation/supplier are broadcast dims; the only real
    shuffle is lineitem x orders on orderkey. The c_nationkey=s_nationkey
    predicate rides on the customer join (no extra shuffle).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "returned_item_customers",
    bench=True,
    tags=("J5", "P6"),
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(sum({REV_SQL}) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "order_priority_counts",
    tags=("A5", "P7"),
    oracle="""
SELECT o_orderpriority,
       count(*) AS order_count,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarterly priority counts + conditional count
    (`count_if` idiom, reference A5 — Aggregated Circulating Supply
    Pipeline.py:371-372)."""
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return (
        orders.filter(
            (od >= F.lit("1997-01-01").cast("date")) & (od < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_count"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "promo_revenue_share",
    tags=("A3", "A4", "J5"),
    oracle=f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REV_SQL} END) AS DOUBLE)
         / CAST(sum({REV_SQL}) AS DOUBLE) * 100 AS promo_pct,
       CAST(sum({REV_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (`MIN/SUM(CASE WHEN ...)`,
    reference A3 — Aggregated Circulating Supply Pipeline.py:110-113)."""
    sd = F.to_date("l_shipdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (sd >= F.lit("1997-09-01").cast("date")) & (sd < F.lit("1997-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue())).cast("double")
            / F.sum(_revenue()).cast("double")
            * 100
        ).alias("promo_pct"),
        F.sum(_revenue()).cast("double").alias("total_revenue"),
    )


@query(
    "scalar_dashboard",
    tags=("J8",),
    oracle="""
SELECT total_customers, total_orders, total_revenue,
       total_revenue / total_orders AS avg_order_value
FROM (SELECT count(*) AS total_customers FROM customer),
     (SELECT count(*) AS total_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
      FROM orders)
""",
)
def scalar_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of 1-row aggregates (reference J8 — `FROM supply, nf,
    accts, counts` in Aggregated Circulating Supply Pipeline.py:384)."""
    cust = load_table(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).alias("total_customers")
    )
    orders = load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_orders"),
        dsum("o_totalprice").alias("total_revenue"),
    )
    return cust.crossJoin(orders).select(
        "total_customers",
        "total_orders",
        "total_revenue",
        (F.col("total_revenue") / F.col("total_orders")).alias("avg_order_value"),
    )


@query(
    "quantity_tier_revenue",
    tags=("J7",),
    oracle=f"""
SELECT tier_name,
       count(*) AS n_items,
       CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN (VALUES ('small', 0, 15), ('medium', 15, 30), ('large', 30, 51))
     AS tiers(tier_name, lo, hi)
  ON l_quantity >= lo AND l_quantity < hi
GROUP BY tier_name
ORDER BY tier_name
""",
)
def quantity_tier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join against a tiny tier table (reference J7 — the
    lockups-alive-at-height theta join, Aggregated Circulating Supply
    Pipeline.py:211-213).

    Scale notes: Spark plans BroadcastNestedLoopJoin; with a 3-row build
    side that is a per-row comparison — exactly what the reference's
    daily-rows theta join does. Never use this shape with two large sides.
    """
    li = load_table(spark, sf_dir, "lineitem")
    tiers = inline_rows_df(
        spark,
        [("small", 0, 15), ("medium", 15, 30), ("large", 30, 51)],
        [("tier_name", "string"), ("lo", "int"), ("hi", "int")],
    )
    return (
        li.join(
            F.broadcast(tiers),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("tier_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_revenue()).cast("double").alias("revenue"),
        )
        .orderBy("tier_name")
    )


@query(
    "market_segments",
    tags=("A7",),
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def market_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT DISTINCT` dedup (reference A7 — Epochs pipeline :629,682)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


@query(
    "nation_rollup",
    tags=("A1", "A6"),
    oracle="""
SELECT n_name,
       count(DISTINCT c_custkey) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal,
       CAST(min(c_acctbal) AS DOUBLE) AS min_acctbal,
       CAST(max(c_acctbal) AS DOUBLE) AS max_acctbal,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-rollup shape (reference A1 — 8 aggregates incl.
    COUNT(DISTINCT) and collect_set, Epochs pipeline :49-65). collect_set is
    canonicalized via sort+join so output is deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
            F.min("c_acctbal").cast("double").alias("min_acctbal"),
            F.max("c_acctbal").cast("double").alias("max_acctbal"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        )
        .orderBy("n_name")
    )


@query(
    "flagged_customers_like_any",
    tags=("P4", "P5"),
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE (c_name LIKE '%001' OR c_name LIKE '%002' OR c_name LIKE '%003')
  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_custkey
""",
)
def flagged_customers_like_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`LIKE ANY` + `IN` set predicate (reference P4/P5 — pool-suffix
    matching, Silver Lake Mainnet.sql:624-626)."""
    cust = load_table(spark, sf_dir, "customer")
    like_any = (
        F.col("c_name").like("%001") | F.col("c_name").like("%002") | F.col("c_name").like("%003")
    )
    return (
        cust.filter(like_any & F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )
