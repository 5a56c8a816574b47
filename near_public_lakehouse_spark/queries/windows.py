"""Window-function queries (SURVEY §2.6) + the batch equivalent of the
SCD-1 keyed upsert (§2.5 A8).

The reference's entire window surface is ranking/offset functions:
W1 `row_number ... desc = 1` latest-per-key, W2 `row_number()-1` sequence,
W3 `lag` delta with coalesce+clamp. No frame specs — we keep that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.time import ns_to_micros
from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table


@query(
    "latest_order_per_customer",
    tags=("W1",),
    oracle="""
SELECT o_custkey, o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 latest-row-per-key: the reference's accounts-view / balance
    snapshot idiom (Epochs pipeline :385-392; BQ Writer Views :380-385).

    Scale notes: one shuffle on the partition key; at 100 TB prefer this
    over `groupBy + max + self-join` (one pass, no re-join). Skewed keys
    are handled by AQE skew-split since rank only needs partition-local
    order.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .orderBy("o_custkey")
    )


@query(
    "customer_order_delta",
    tags=("W3",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(greatest(
         coalesce(CAST(o_totalprice AS DECIMAL(18,2))
                  - lag(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                  0), 0) AS DOUBLE) AS price_delta
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def customer_order_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 `LAG` delta with `coalesce(delta, 0)` + clamp-at-zero — the
    per-epoch staking-reward delta pattern (Epochs pipeline :345-361)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    delta = F.coalesce(price - F.lag(price).over(w), F.lit(0))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.greatest(delta, F.lit(0)).cast("double").alias("price_delta"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "event_sequences",
    tags=("W2",),
    oracle="""
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
FROM events
ORDER BY user_id, seq
""",
)
def event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 `row_number()-1` intra-partition event sequence
    (FT and NFT events.py:70,145)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", (F.row_number().over(w) - 1).alias("seq")
    ).orderBy("user_id", "seq")


@query(
    "scd1_user_snapshot",
    tags=("A8", "W1"),
    oracle="""
SELECT user_id, last_event_type, last_value, last_seen_us, n_events
FROM (
  SELECT user_id,
         event_type AS last_event_type,
         CAST(value AS DOUBLE) AS last_value,
         epoch_us(ts) AS last_seen_us,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
""",
)
def scd1_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch arg-max equivalent of `APPLY CHANGES ... KEYS(user) SEQUENCE BY
    ts STORED AS SCD TYPE 1` (SCD tables.sql:14-39): latest state per key by
    event time. The incremental/streaming version is
    operators/scd.apply_changes; this query pins the same semantics to the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").cast("double").alias("last_value"),
            ns_to_micros("ts").alias("last_seen_us"),
            F.count(F.lit(1)).over(wc).alias("n_events"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@query(
    "ranked_customer_balances",
    tags=("W", "rank", "beyond-reference"),
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(c_acctbal AS DOUBLE) AS acctbal,
       dense_rank()   OVER w AS drank,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist,
       first_value(c_custkey) OVER (
         PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_nationkey, drank, c_custkey
""",
)
def ranked_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family (dense_rank, ntile, percent_rank,
    cume_dist, first_value over an explicit full frame) per nation by
    balance — completing §2.6 beyond the reference's row_number/lag-only
    usage.

    Scale notes: one window shuffle+sort on nationkey; the (acctbal,
    custkey) tie-break makes ntile deterministic (ties would otherwise
    straddle bucket borders engine-dependently). first_value gets an
    explicit unbounded frame: the default frame stops at CURRENT ROW,
    which is correct here but a classic silent-semantics trap when
    someone swaps in last_value.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.dense_rank().over(w).alias("drank"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("prank"),
            F.cume_dist().over(w).alias("cdist"),
            F.first_value("c_custkey").over(wfull).alias("richest_custkey"),
        )
        .orderBy("c_nationkey", "drank", "c_custkey")
    )


@query(
    "scd2_user_history",
    tags=("A8", "W2", "beyond-reference"),
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
isl AS (
  SELECT user_id, event_type, us, event_id FROM e
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL AS is_current
FROM isl ORDER BY user_id, valid_from_us
""",
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 batch twin: each user's event_type change history with
    validity ranges — the gaps-and-islands shape `operators/scd.py
    scd2_history` maintains incrementally (``STORED AS SCD TYPE 2`` in DLT
    terms). Two windows over the SAME (user_id, ts) sort order, so
    Catalyst plans ONE shuffle + one sort for both; no joins."""
    from near_public_lakehouse_spark.functions.time import ns_to_micros

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    islands = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", ns_to_micros("ts").alias("us"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        islands.withColumn("valid_to_us", F.lead("us").over(w2))
        .select(
            "user_id",
            "event_type",
            F.col("us").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )
