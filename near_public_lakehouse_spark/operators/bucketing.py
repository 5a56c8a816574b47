"""Bucketed table layouts: pre-shuffled storage for co-located joins.

The 100 TB join discipline (SURVEY §7 / BASELINE north star): a fact table
joined on the same key every day should not re-shuffle per query. Writing
both sides bucketed by the join key (`bucketBy(n, key).sortBy(key)` into
the catalog) lets Spark plan a SortMergeJoin with NO Exchange on either
side — the shuffle is paid once at write time and amortized over every
subsequent join. The reference approximates this with BQ clustering
(BQ Writer Stream.py:25-26, M3); bucketing is the OSS-Spark native form.

Notes:
- Bucketed layouts require the session catalog (`saveAsTable`) — plain
  `.parquet(path)` writes ignore bucket specs silently.
- Both sides must agree on bucket count (or be a multiple under
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
- AQE leaves bucketed joins alone; `spark.sql.sources.bucketing.enabled`
  is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a catalog table bucketed (and sorted) by
    `bucket_cols`. The write shuffles once on the bucket key; every later
    equi-join or aggregation on that key is then exchange-free."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def colocate(df: DataFrame, key: str) -> DataFrame:
    """In-session analog of the bucketed layout for ITERATIVE jobs:
    materialize `df` hash-partitioned + sorted by the per-round join key,
    with the partitioning PRESERVED into the checkpoint's LogicalRDD, so
    every subsequent join on `key` reads this side with NO Exchange and
    NO Sort (GraphX's partition-once/ship-vertex-state strategy).

    WHEN IT WINS — measured rule (sf0.1, local[32], HITS/PageRank A/B):
    while the per-round state side (rank/label vector) fits a broadcast,
    AQE converts each round's SortMergeJoin to a BroadcastHashJoin at
    runtime, and that path beats this layout decisively (HITS half-round:
    1.06 s AQE-broadcast vs 2.17 s co-located SMJ; full query 40 vs 550
    task-seconds) — the SMJ's per-partition merge over 64 preserved
    partitions costs more CPU than streaming the edge side through a
    broadcast probe. So: do NOT colocate while the state side is
    broadcastable. Colocate (or use the bucketed-write variants in
    queries/graph.py) when the vertex state exceeds broadcast size — the
    100 TB regime where re-shuffling the O(E) side every round is the
    bottleneck and AQE has no broadcast escape hatch.

    AQE must be OFF while the checkpoint materializes: AdaptiveSparkPlan's
    final output partitioning is opaque (UnknownPartitioning), so a
    checkpoint taken under AQE loses the co-location and every round
    re-shuffles the O(E) side. The session flag is restored in a finally
    block; plan shape is pinned in tests/test_plan_shapes.py
    (colocated-graph-iteration pin).

    THREAD-SAFETY CAVEAT: the AQE toggle is session-global, so any query
    running CONCURRENTLY on the same SparkSession briefly executes
    without AQE while the checkpoint materializes. Call from single-query
    driver code (the iterative jobs here do), or give concurrent
    workloads their own session."""
    spark = df.sparkSession
    raw_n = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        n = int(raw_n)
    except (TypeError, ValueError):
        # platforms that set the conf to 'auto' (AQE-managed): fall back
        # to the session default parallelism rather than crashing.
        n = spark.sparkContext.defaultParallelism
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        return df.repartition(n, key).sortWithinPartitions(key).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan contains no Exchange
    (verify with .explain — the test pins this)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
