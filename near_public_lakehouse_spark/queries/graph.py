"""Iterative graph analytics over the TPC-H-ish tables: weighted
PageRank on the customer-supplier interaction graph.

The near-dup machinery already exercises connected components (two
engines, `queries/dedup.py`); this adds the other canonical iterative
graph primitive, with a REAL cross-engine oracle: the DuckDB side
unrolls the same {PR_ITERS} power iterations as generated CTE text
(`_pr_iteration_sql`), so every intermediate rank vector — not just an
invariant — is hash-compared. That makes this one of the few iterative
algorithms in the registry with a full-value oracle rather than a
rows-only twin.

Graph: undirected bipartite customer<->supplier, edge weight = number
of lineitems the pair transacted (lineitem x orders join). Every
included node has degree >= 1 by construction, so the walk has no
dangling mass.

Scale design: one edge-build shuffle (groupBy pair), then {PR_ITERS}
bounded rounds, each ONE join-aggregate shuffled on the edge source key
— the standard Pregel/GraphX message-passing shape; rank state is
O(nodes) and localCheckpointed per round to keep lineage flat. The only
driver-side read is the node count (one scalar).

Cross-engine determinism: ranks are rounded to 12 dp after EVERY
iteration on both engines, so summation-order noise (different
neighbor-contribution orders) cannot compound across rounds; the output
then passes the driver's 6 dp float canonicalization with margin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table

PR_DAMPING = 0.85
PR_ITERS = 10
PR_DP = 12  # per-iteration rounding keeps both engines in lockstep


def _pr_iteration_sql() -> str:
    """r1..r{PR_ITERS} CTEs, each one power-iteration step over r(k-1)."""
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(
            f"""r{k} AS (
  SELECT e.dst AS node,
         round((1 - {PR_DAMPING}) / max(nn.n)
               + {PR_DAMPING} * sum(e.w / d.deg * r.rank), {PR_DP}) AS rank
  FROM edges e
  JOIN deg d ON d.src = e.src
  JOIN r{k - 1} r ON r.node = e.src
  CROSS JOIN nn
  GROUP BY e.dst
)"""
        )
    return ",\n".join(steps)


_PAGERANK_ORACLE = f"""
WITH edges0 AS (
  SELECT 'C' || o.o_custkey AS a, 'S' || l.l_suppkey AS b,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM edges0
  UNION ALL
  SELECT b AS src, a AS dst, w FROM edges0
),
deg AS (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, round(1.0 / n, {PR_DP}) AS rank FROM nodes CROSS JOIN nn),
{_pr_iteration_sql()}
SELECT substr(node, 1, 1) AS node_type,
       CAST(substr(node, 2) AS BIGINT) AS node_id,
       rank AS pagerank
FROM r{PR_ITERS}
ORDER BY node_type, node_id
"""


@query(
    "graph_pagerank",
    tags=("graph", "iterative", "beyond-reference"),
    oracle=_PAGERANK_ORACLE,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping {PR_DAMPING}, {PR_ITERS} iterations)
    over the undirected customer-supplier graph — edge weight = lineitem
    count per pair. Every iteration is one edge-partitioned
    join-aggregate (Pregel message passing as a DataFrame op); the
    DuckDB oracle unrolls the identical iterations, so the full rank
    vector is value-checked, not just an invariant."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("b"),
            "w",
        )
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = float(nodes.count())  # bounded driver scalar

    rank = nodes.select("node", F.round(F.lit(1.0) / F.lit(n), PR_DP).alias("rank"))
    contrib_src = edges.join(deg, "src")
    for _ in range(PR_ITERS):
        rank = (
            contrib_src.join(rank.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(
                F.round(
                    F.lit((1 - PR_DAMPING) / n)
                    + PR_DAMPING
                    * F.sum(F.col("w") / F.col("deg") * F.col("rank")),
                    PR_DP,
                ).alias("rank")
            )
            .withColumnRenamed("dst", "node")
            .localCheckpoint()
        )
    return rank.select(
        F.substring("node", 1, 1).alias("node_type"),
        F.expr("CAST(substring(node, 2) AS BIGINT)").alias("node_id"),
        F.col("rank").alias("pagerank"),
    ).orderBy("node_type", "node_id")


# ---------------------------------------------------------------------------
# BFS hop distances — the min-plus twin of the PageRank iteration

BFS_ITERS = 8
BFS_SOURCE = "S1"  # supplier 1: present at every SF


def _bfs_iteration_sql() -> str:
    steps = []
    for k in range(1, BFS_ITERS + 1):
        steps.append(
            f"""d{k} AS (
  SELECT node, min(hops) AS hops FROM (
    SELECT node, hops FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, r.hops + 1 AS hops
    FROM edges e JOIN d{k - 1} r ON r.node = e.src
  ) GROUP BY node
)"""
        )
    return ",\n".join(steps)


_BFS_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT 'C' || o.o_custkey AS a, 'S' || l.l_suppkey AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM edges0
  UNION ALL
  SELECT b AS src, a AS dst FROM edges0
),
d0 AS (SELECT '{BFS_SOURCE}' AS node, CAST(0 AS BIGINT) AS hops),
{_bfs_iteration_sql()}
SELECT substr(node, 1, 1) AS node_type,
       CAST(substr(node, 2) AS BIGINT) AS node_id,
       hops
FROM d{BFS_ITERS}
ORDER BY node_type, node_id
"""


@query(
    "graph_bfs_hops",
    tags=("graph", "iterative", "beyond-reference"),
    oracle=_BFS_ORACLE,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from supplier {BFS_SOURCE} to every reachable
    node within {BFS_ITERS} hops on the undirected customer-supplier
    graph — the min-plus (shortest-path) twin of the PageRank iteration:
    each round expands the frontier by one edge join and folds with
    min(hops), all-integer so the cross-engine check is exact with no
    rounding discipline needed. The DuckDB oracle unrolls the identical
    rounds. Frontier state is O(reached nodes); each round is one
    edge-partitioned join-aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    dist = spark.createDataFrame([(BFS_SOURCE, 0)], "node string, hops bigint")
    for _ in range(BFS_ITERS):
        expanded = edges.join(
            dist.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    return dist.select(
        F.substring("node", 1, 1).alias("node_type"),
        F.expr("CAST(substring(node, 2) AS BIGINT)").alias("node_id"),
        "hops",
    ).orderBy("node_type", "node_id")


# ---------------------------------------------------------------------------
# HITS hubs/authorities — the bipartite link-analysis twin

HITS_ITERS = 8
HITS_DP = 12
_HITS_DEC = "DECIMAL(30,15)"


def _hits_iteration_sql() -> str:
    """h{k}/a{k} CTE pairs: decimal-exact neighbor sums (order-free, the
    repo's dsum discipline) then max-normalization + rounding — every
    intermediate is bit-identical across engines, so no noise compounds.
    Normalization uses `max(s) OVER ()` so each CTE is referenced exactly
    once: DuckDB INLINES CTE references, and a scalar-subquery max would
    double-reference each round, exploding the unrolled plan (and the
    parquet open count) exponentially."""
    steps = []
    for k in range(1, HITS_ITERS + 1):
        steps.append(
            f"""h{k}_raw AS (
  SELECT e.cust AS node,
         CAST(sum(CAST(e.w * a.score AS {_HITS_DEC})) AS DOUBLE) AS s
  FROM edges e JOIN a{k - 1} a ON a.node = e.supp
  GROUP BY e.cust
),
h{k} AS (
  SELECT node, round(s / max(s) OVER (), {HITS_DP}) AS score FROM h{k}_raw
),
a{k}_raw AS (
  SELECT e.supp AS node,
         CAST(sum(CAST(e.w * h.score AS {_HITS_DEC})) AS DOUBLE) AS s
  FROM edges e JOIN h{k} h ON h.node = e.cust
  GROUP BY e.supp
),
a{k} AS (
  SELECT node, round(s / max(s) OVER (), {HITS_DP}) AS score FROM a{k}_raw
)"""
        )
    return ",\n".join(steps)


_HITS_ORACLE = f"""
WITH edges AS (
  SELECT 'C' || o.o_custkey AS cust, 'S' || l.l_suppkey AS supp,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
a0 AS (SELECT DISTINCT supp AS node, CAST(1.0 AS DOUBLE) AS score FROM edges),
{_hits_iteration_sql()}
SELECT * FROM (
  SELECT 'C' AS node_type, CAST(substr(node, 2) AS BIGINT) AS node_id,
         score AS hub_or_auth
  FROM h{HITS_ITERS}
  UNION ALL
  SELECT 'S' AS node_type, CAST(substr(node, 2) AS BIGINT) AS node_id,
         score AS hub_or_auth
  FROM a{HITS_ITERS}
)
ORDER BY node_type, node_id
"""


@query(
    "link_analysis_hits",
    tags=("graph", "iterative", "beyond-reference"),
    oracle=_HITS_ORACLE,
)
def link_analysis_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities on the customer->supplier bipartite graph
    (customers are hubs, suppliers authorities; edge weight = lineitem
    count), {HITS_ITERS} iterations. Two determinism tools make the full
    score vector oracle-checkable: neighbor sums use the repo's
    decimal-exact dsum discipline (order-free, engine-identical — plain
    double sums would drift by summation order), and each round
    normalizes by the MAX score (an order-free reduction, unlike an L2
    norm whose sum-of-squares would reintroduce float noise). The DuckDB
    oracle unrolls the identical rounds. Each half-iteration is one
    edge-partitioned join-aggregate; score state is O(nodes)."""
    from near_public_lakehouse_spark.functions.numeric import dsum

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("cust"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("supp"),
            "w",
        )
        .localCheckpoint()
    )

    def _norm_round(raw: DataFrame) -> DataFrame:
        mx = raw.agg(F.max("s").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node", F.round(F.col("s") / F.col("mx"), HITS_DP).alias("score")
        )

    auth = edges.select(F.col("supp").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("score")
    )
    for _ in range(HITS_ITERS):
        hub = _norm_round(
            edges.join(auth.withColumnRenamed("node", "supp"), "supp")
            .groupBy("cust")
            .agg(dsum(F.col("w") * F.col("score"), scale=15, precision=30).alias("s"))
            .withColumnRenamed("cust", "node")
        ).localCheckpoint()
        auth = _norm_round(
            edges.join(hub.withColumnRenamed("node", "cust"), "cust")
            .groupBy("supp")
            .agg(dsum(F.col("w") * F.col("score"), scale=15, precision=30).alias("s"))
            .withColumnRenamed("supp", "node")
        ).localCheckpoint()
    out = hub.select(
        F.lit("C").alias("node_type"),
        F.expr("CAST(substring(node, 2) AS BIGINT)").alias("node_id"),
        F.col("score").alias("hub_or_auth"),
    ).unionByName(
        auth.select(
            F.lit("S").alias("node_type"),
            F.expr("CAST(substring(node, 2) AS BIGINT)").alias("node_id"),
            F.col("score").alias("hub_or_auth"),
        )
    )
    return out.orderBy("node_type", "node_id")
