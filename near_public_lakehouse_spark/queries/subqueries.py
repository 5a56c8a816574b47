"""Subquery-shaped queries: correlated scalar subqueries, semi/anti joins,
global scalar thresholds (TPC-H Q15/Q17/Q18/Q22 shapes).

SURVEY.md §2.4 notes the reference has no semi/anti joins — its "is there a
matching row" questions are all answered with LEFT JOIN + null-filter (the
accounts view) or IN-lists. A complete engine still needs the dedicated
operators: Spark plans `left_semi`/`left_anti` as one-sided hash joins that
never materialize the probe payload, which at 100 TB is the difference
between shipping a boolean and shipping the table.

Exactness rule for thresholds: never compare against a divided average
(engines disagree on division scale). `x < avg(y) * k` is rewritten as
`x * n / k' < sum(y)` over exact DECIMALs, identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.numeric import dsum
from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table

REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _revenue():
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))


@query(
    "small_quantity_revenue",
    tags=("subquery", "A4"),
    oracle="""
WITH pq AS (
  SELECT l_partkey AS pk, count(*) AS n, sum(CAST(l_quantity AS DECIMAL(28,6))) AS sq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS DOUBLE)
         AS avg_yearly,
       count(*) AS n_small_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON pk = l_partkey
WHERE p_brand IN ('Brand#23', 'Brand#42')
  AND CAST(l_quantity AS DECIMAL(28,6)) * 5 * n < sq
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — lineitems below 20% of
    their part's average quantity.

    Scale notes: the correlated `(SELECT avg ... WHERE same part)` becomes a
    self-aggregation on l_partkey + an equi join back — both shuffles are on
    the same key, so AQE coalesces them into one exchange reuse. The
    `0.2 * avg` threshold is the division-free `qty * 5 * n < sum` form so
    Spark and the oracle agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#23", "Brand#42")
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("sq"),
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(pq, li.l_partkey == pq.pk)
        .filter(F.col("l_quantity").cast("decimal(28,6)") * 5 * F.col("n") < F.col("sq"))
        .agg(
            (dsum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


@query(
    "large_quantity_orders",
    tags=("subquery", "J5"),
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(28,6))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(28,6))) > 250) big
  ON o_orderkey = big.l_orderkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: `o_orderkey IN (SELECT ... HAVING sum > k)` — the
    IN-subquery materialized as an aggregate + equi join.

    Scale notes: the HAVING filter runs on the aggregated (small) side
    before the join, so the orders probe only sees qualifying keys. One
    shuffle on orderkey for the agg; the join reuses that partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "top_supplier",
    tags=("subquery", "A2"),
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS suppkey, sum({REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN rev ON s_suppkey = suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
""",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar subquery equality against a max — the
    top-revenue supplier(s) for a quarter, ties kept.

    Scale notes: revenue is DECIMAL-exact so the `= max(...)` equality is
    deterministic (float revenue would make ties engine-dependent). The
    1-row max is a broadcast, not a sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    sd = F.to_date("l_shipdate")
    rev = (
        li.filter((sd >= F.lit("1996-01-01").cast("date")) & (sd < F.lit("1996-04-01").cast("date")))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(sup), F.col("suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "idle_rich_customers",
    tags=("subquery", "anti"),
    oracle="""
WITH pos AS (
  SELECT count(*) AS n, sum(CAST(c_acctbal AS DECIMAL(28,2))) AS tot
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_acctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(28,2)) * n > tot
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar threshold + NOT EXISTS anti join —
    above-average-balance customers who never ordered, rolled up by nation.

    Scale notes: `left_anti` ships only o_custkey from orders (column-pruned
    scan) and keeps no payload; the `> avg` threshold is the division-free
    `bal * n > sum` DECIMAL form; the 1-row threshold frame is broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(28,2)")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum(bal).alias("tot")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n") > F.col("tot"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(bal).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "returned_orders_semi",
    tags=("subquery", "semi"),
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def returned_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi join (TPC-H Q4's true form): orders with at least one
    returned lineitem, counted per priority.

    Scale notes: `left_semi` emits each order at most once without
    deduplicating lineitem first — the join carries no right-side payload
    and short-circuits on first match, unlike an inner join + distinct
    which would shuffle every matching lineitem row.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "cheapest_part_offers",
    tags=("subquery", "argmin"),
    oracle="""
WITH mn AS (
  SELECT l_partkey AS pk, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, l_suppkey, l_orderkey,
       CAST(l_extendedprice AS DOUBLE) AS price
FROM lineitem JOIN mn ON l_partkey = pk AND l_extendedprice = min_price
ORDER BY l_partkey, l_suppkey, l_orderkey
LIMIT 100
""",
)
def cheapest_part_offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min subquery — the lineitem(s) matching
    each part's minimum price, ties kept (no partsupp table in testdata, so
    lineitem is the part-supplier offer relation).

    Scale notes: equality is on the *untouched* parquet double (no
    arithmetic), so cross-engine comparison is exact. Same-key agg + join
    as Q17 — one exchange, reused.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mn = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(mn, (li.l_partkey == mn.pk) & (li.l_extendedprice == mn.min_price))
        .select(
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        .orderBy("l_partkey", "l_suppkey", "l_orderkey")
        .limit(100)
    )
