"""Table maintenance: compaction, Z-order-style clustering, bloom filters.

OSS stand-ins for the reference's post-merge upkeep (M2 — `OPTIMIZE
[ZORDER BY]` + `VACUUM` after every gold MERGE, Epochs pipeline :95-96,
203-204, ...; M6 — ClickHouse bloom/minmax indexes):

- `compact_partitions`: rewrite a partition's many small files into few
  (Delta's OPTIMIZE bin-packing). Streaming sinks produce one file per
  micro-batch; at 1 block/s that is ~86k files/day/table without this.
- `zorder_by`: sort-within-partition on the clustering keys before
  rewrite. A single-dimension sort gives parquet min/max row-group
  statistics the same skipping power ZORDER gives Delta for the dominant
  filter column (multi-dim interleaving needs Delta itself).
- `bloom_filter_options`: parquet-native bloom filters on point-lookup
  keys (receipt_id / transaction_hash / account_id) — the M6 mapping
  SURVEY §4 prescribes.

All rewrites are partition-scoped (dynamic overwrite): maintenance cost is
O(partitions touched), never O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bloom_filter_options(*columns: str, fpp: float = 0.01) -> dict[str, str]:
    """Writer options enabling parquet bloom filters for `columns`."""
    opts: dict[str, str] = {}
    for c in columns:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.fpp#{c}"] = str(fpp)
    return opts


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str = "block_date",
    partitions: list | None = None,
    target_files_per_partition: int = 1,
    zorder_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> None:
    """OPTIMIZE [ZORDER BY]: rewrite (a subset of) partitions with
    `target_files_per_partition` files each, optionally sorted by
    `zorder_cols` and bloom-filtered on `bloom_cols`."""
    from near_public_lakehouse_spark.operators.merge import _recover

    _recover(table_path)
    df = spark.read.parquet(table_path)
    if partitions is not None:
        df = df.filter(F.col(partition_col).isin(partitions))
    out = df.repartition(target_files_per_partition, F.col(partition_col))
    if zorder_cols:
        out = out.sortWithinPartitions(partition_col, *zorder_cols)
    # Crash-safe materialize-then-swap (shared with MERGE): never write
    # onto the path the plan is reading, never leak session conf.
    from near_public_lakehouse_spark.operators.merge import _rewrite

    _rewrite(
        spark,
        out,
        table_path,
        partition_col,
        writer_options=bloom_filter_options(*(bloom_cols or [])),
    )


def zorder_by(
    spark: SparkSession, table_path: str, partition_col: str, cols: list[str]
) -> None:
    """Convenience: full-table clustering rewrite (use compact_partitions
    with an explicit partition list for incremental upkeep)."""
    compact_partitions(
        spark, table_path, partition_col, None, zorder_cols=cols, bloom_cols=cols[:1]
    )


def file_count(spark: SparkSession, table_path: str) -> int:
    """Small-file health probe (what VACUUM/OPTIMIZE monitoring reads)."""
    import glob
    import os

    return len(glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True))
