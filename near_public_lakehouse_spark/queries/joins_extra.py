"""Join shapes beyond the reference's inventory: outer-join aggregation
(TPC-H Q13), disjunctive join residuals (Q19), symmetric nation-pair
predicates (Q7). SURVEY §2.4 lists what the reference uses; these are the
remaining classical plan classes a complete engine must handle well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    "orders_per_customer_histogram",
    tags=("J6", "A5"),
    oracle="""
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
)
def orders_per_customer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer, zero-order
    customers included via LEFT JOIN + count(non-null).

    Scale notes: the inner count shuffles on custkey (the join's own key,
    so the aggregation reuses the exchange); the outer histogram shuffles
    a few hundred distinct counts — negligible. count(o_orderkey) — not
    count(*) — is what makes unmatched customers land in bucket 0.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "disjunctive_predicate_revenue",
    tags=("J5", "P4"),
    oracle=f"""
SELECT count(*) AS n_lines,
       CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions as a join residual.

    Scale notes: Catalyst keeps the equi-key (partkey) as the hash join key
    and evaluates the disjunction as a post-join filter; it also derives the
    per-side implied filters (brand IN (...) on part, quantity <= 30 on
    lineitem) and pushes them into the scans — check PushedFilters. Writing
    the OR across the join is fine; hand-splitting into three joins + union
    would triple the probe work.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_revenue()).cast("double").alias("revenue"),
        )
    )


@query(
    "trade_volume_bilateral",
    tags=("J5", "A4"),
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(CAST(l_shipdate AS DATE)) AS l_year,
         {REV_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def trade_volume_bilateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a symmetric pair of nations,
    split by direction and ship year.

    Scale notes: both nation lookups broadcast; the disjunctive pair
    predicate cannot prune either fact side alone beyond `nationkey IN
    (3,7)` — which Catalyst derives and pushes through the broadcast joins.
    The only big shuffle is lineitem x orders on orderkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "region_hierarchy_rollup",
    tags=("recursive", "beyond-reference"),
    oracle="""
WITH RECURSIVE edges AS (
  SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS parent,
         'N' || CAST(n_nationkey AS VARCHAR) AS child
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS parent,
         'C' || CAST(c_custkey AS VARCHAR) AS child
  FROM customer
),
descendants AS (
  SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS root,
         'R' || CAST(r_regionkey AS VARCHAR) AS node
  FROM region
  UNION ALL
  SELECT d.root, e.child FROM descendants d JOIN edges e ON e.parent = d.node
)
SELECT root, count(*) AS n_nodes FROM descendants GROUP BY root ORDER BY root
""",
)
def region_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x) descendant rollup over the acyclic
    region -> nation -> customer hierarchy: per region, count the whole
    subtree via iterated self-reference.

    Scale notes: Spark's recursive CTE supports UNION ALL only, which is
    exactly right for a DAG/tree (each node reached once per path; in a
    tree, once) — and exactly wrong for cyclic graphs (see
    dedup_clusters, which uses iterative propagation instead). Depth here
    is 2, so the recursion materializes three generations and stops.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    region.createOrReplaceTempView("v_region")
    nation.createOrReplaceTempView("v_nation")
    cust.createOrReplaceTempView("v_customer")
    return spark.sql(
        """
WITH RECURSIVE edges AS (
  SELECT 'R' || CAST(r_regionkey AS STRING) AS parent,
         'N' || CAST(n_nationkey AS STRING) AS child
  FROM v_nation JOIN v_region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'N' || CAST(c_nationkey AS STRING) AS parent,
         'C' || CAST(c_custkey AS STRING) AS child
  FROM v_customer
),
descendants AS (
  SELECT 'R' || CAST(r_regionkey AS STRING) AS root,
         'R' || CAST(r_regionkey AS STRING) AS node
  FROM v_region
  UNION ALL
  SELECT d.root, e.child FROM descendants d JOIN edges e ON e.parent = d.node
)
SELECT root, count(*) AS n_nodes FROM descendants GROUP BY root ORDER BY root
"""
    )
