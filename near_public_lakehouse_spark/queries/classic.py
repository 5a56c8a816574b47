"""Remaining classical OLAP plan classes (TPC-H Q8/Q9/Q11/Q12/Q16/Q20/Q21
shapes), adapted to the driver's schema (no partsupp / shipmode / comment
columns — each query keeps the PLAN CLASS and swaps in available columns).

The reference (`near/near-public-lakehouse`) never issues these shapes —
its analytics are append-only rollups — but a complete engine must plan
them well:
- Q8: two independent dimension paths into one fact, conditional share.
- Q9: profit expression spanning fact and dimension columns.
- Q11: GROUP BY ... HAVING <group agg> vs <global scalar> (division-free).
- Q12: two-class conditional counts with a row-level date-arithmetic fence.
- Q16: COUNT(DISTINCT) per wide group with a NOT-IN anti-join.
- Q20: nested correlation — semi-join on a per-(k1,k2) share threshold.
- Q21: EXISTS + NOT EXISTS self-joins on the fact table.

Scale notes (100 TB): every query here shuffles lineitem at most twice; the
dimension sides (part/supplier/customer/nation/region at TPC-H ratios) are
broadcast. Q21's two self-joins share the l_orderkey shuffle — AQE reuses
the exchange. Q16's COUNT(DISTINCT) is a two-phase hash expand, not a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.queries.subqueries import REV_SQL, _revenue
from near_public_lakehouse_spark.sources.tables import load_table

ASIA_FOCAL = "NATION_7"


def _nations_regions(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation, region


@query(
    "nation_market_share",
    tags=("J5", "A3", "classic"),
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       CAST(CAST(sum(CASE WHEN sn.n_name = '{ASIA_FOCAL}' THEN {REV_SQL} END)
                 AS DOUBLE)
            / CAST(sum({REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY year(o_orderdate)
ORDER BY o_year
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one fact, two independent dimension paths (supplier
    nation for the numerator flag, customer nation→region for the market
    fence), conditional revenue share per year.

    Scale notes: both dimension paths are broadcast chains collapsed onto
    the lineitem→orders join, so the only shuffle is l_orderkey=o_orderkey;
    the share division happens on two exact DECIMAL sums per year-group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation, region = _nations_regions(spark, sf_dir)

    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    asia_cust = cust.join(
        F.broadcast(asia_nations), cust.c_nationkey == F.col("cn_key")
    ).select("c_custkey")

    rev = _revenue()
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(asia_cust), orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == ASIA_FOCAL, rev)).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "profit_by_nation_year",
    tags=("J5", "A4", "classic"),
    oracle="""
SELECT sn.n_name AS nation, year(l_shipdate) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY sn.n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
""",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit expression mixing fact columns with a joined
    dimension column (retailprice stands in for ps_supplycost — the
    testdata has no partsupp), LIKE-filtered part dimension, grouped by
    supplier nation and ship year.

    Scale notes: part and supplier⋈nation both broadcast; lineitem is
    scanned once and shuffles only for the final (nation, year) aggregate.
    The LIKE filter lands in PushedFilters (StringContains) at the scan.
    """
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    profit = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity") * F.lit(0.10).cast("decimal(4,2)")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "important_nation_revenue",
    tags=("A4", "subquery", "classic"),
    oracle=f"""
WITH per_nation AS (
  SELECT n_name AS nation, sum({REV_SQL}) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT nation, CAST(rev AS DOUBLE) AS revenue
FROM per_nation, (SELECT sum(rev) AS total FROM per_nation)
WHERE rev * 20 > total
ORDER BY revenue DESC, nation
""",
)
def important_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: GROUP BY ... HAVING <group sum> greater than a
    <global scalar subquery> fraction (here: nations holding > 5% of global
    supplier revenue). Division-free: ``rev * 20 > total`` on exact
    DECIMALs, so both engines agree bit-for-bit.

    Scale notes: the per-nation aggregate is tiny (25 rows); the global
    total is re-aggregated FROM THE GROUPED RESULT, not the fact table —
    one lineitem scan, one shuffle, then a 1-row broadcast cross join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    per_nation = (
        li.join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation")
        .agg(F.sum(_revenue()).alias("rev"))
    )
    total = per_nation.agg(F.sum("rev").alias("total"))
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("rev") * 20 > F.col("total"))
        .select("nation", F.col("rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@query(
    "late_shipment_priority_counts",
    tags=("A5", "classic"),
    oracle="""
SELECT year(l_shipdate) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY year(l_shipdate)
ORDER BY ship_year
""",
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-class conditional counts behind a row-level
    date-arithmetic fence (lines shipped > 60 days after their order —
    the testdata has no shipmode/commitdate, the late-shipment fence keeps
    the cross-table inequality predicate of the original).

    Scale notes: the inequality references both join sides, so it is a
    post-join filter by necessity; everything else (projection pruning to
    4 columns, the single o_orderkey shuffle) is Catalyst's.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "supplier_part_variety",
    tags=("A6", "subquery", "classic"),
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per wide (brand, type,
    size) group, excluding a blacklist via NOT IN → broadcast left_anti
    (negative-balance suppliers stand in for the 'Customer Complaints'
    comment scan).

    Scale notes: the NOT IN list is provably null-free (s_suppkey is a
    key), so the anti-join rewrite is exact. COUNT(DISTINCT) runs as
    Spark's two-phase partial-distinct expand — no global sort, and the
    distinct set is per-group, never driver-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "dominant_part_shippers",
    tags=("subquery", "classic"),
    oracle="""
WITH sp AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(28,6))) AS supp_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1997
  GROUP BY l_suppkey, l_partkey
),
pt AS (
  SELECT pk, sum(supp_qty) AS total_qty FROM sp GROUP BY pk
)
SELECT DISTINCT s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT sk FROM sp
  JOIN pt USING (pk)
  JOIN part ON p_partkey = pk
  WHERE p_name LIKE 'blue%' AND supp_qty * 2 > total_qty
)
ORDER BY s_name
""",
)
def dominant_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested correlation — suppliers who shipped more
    than half of some blue part's 1997 volume. The correlated
    ``0.5 * sum(l_quantity)`` threshold becomes a per-part re-aggregation
    of the (supplier, part) rollup joined back on partkey; the outer IN
    becomes a left_semi into supplier.

    Scale notes: division-free ``supp_qty * 2 > total_qty`` on exact
    DECIMALs; both aggregation levels share the l_partkey-prefixed
    shuffle, and the semi-join ships only qualifying suppkeys.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    supp = load_table(spark, sf_dir, "supplier")
    sp = li.groupBy(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("supp_qty"))
    pt = sp.groupBy("pk").agg(F.sum("supp_qty").alias("total_qty"))
    dominant = (
        sp.join(pt, "pk")
        .join(F.broadcast(part.select(F.col("p_partkey").alias("pk"))), "pk")
        .filter(F.col("supp_qty") * 2 > F.col("total_qty"))
        .select("sk")
    )
    return (
        supp.join(dominant, supp.s_suppkey == F.col("sk"), "left_semi")
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "waiting_suppliers",
    tags=("subquery", "classic"),
    oracle="""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table —
    the only supplier who shipped late (> 60 days after order) on a
    finished multi-supplier order.

    Scale notes: both correlated subqueries collapse into per-order
    statistics over the SAME rows (any other supplier? any other LATE
    supplier?), computed as window aggregates over
    ``partition by l_orderkey`` — ONE lineitem scan and ONE l_orderkey
    shuffle, where the literal EXISTS/NOT-EXISTS translation would scan
    and shuffle the fact table three times. NOT EXISTS on 'another late
    supplier' is equivalent to 'this supplier is the order's only late
    one': late-supplier set size == 1 and this line is late.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    with_order = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
        )
        .withColumn(
            "is_late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
                "int"
            ),
        )
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).over(w)),
        )
    )
    qualifying = with_order.filter(
        (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        qualifying.join(F.broadcast(supp), qualifying.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
