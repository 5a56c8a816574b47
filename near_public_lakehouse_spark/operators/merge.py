"""Keyed MERGE upsert over parquet tables.

OSS stand-in for Delta's ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT`` (reference M1 — 12+ sites, e.g. Epochs pipeline :84-90,
Aggregated Circulating Supply Pipeline.py:87-94). delta-spark isn't in this
container, so the engine implements MERGE as a full-outer join + rewrite.

Scale design: a naive MERGE rewrites the whole table. The reference never
does that — every MERGE is fenced to a date window over `block_date`
partitions (NEAR Public Datasets.py:77-81,149-154). `partition_col`
reproduces that: only partitions present in the source are read, merged and
dynamically overwritten; untouched partitions are never opened. At 100 TB a
daily merge then costs O(days-touched), not O(history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        n.endswith(".parquet") or n.startswith("part-") or "=" in n for n in os.listdir(path)
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    when_matched_update: bool = True,
    ignore_null_updates: bool = False,
) -> None:
    """MERGE `source` into the parquet table at `target_path` on `keys`.

    - matched + `when_matched_update`: source row wins (per-column
      ``coalesce(src, tgt)`` when `ignore_null_updates`, the reference's
      `IGNORE NULL UPDATES` — SCD tables.sql A8 / SURVEY §7 hard-parts).
    - matched + not `when_matched_update`: insert-only MERGE (reference
      `WHEN NOT MATCHED INSERT *` variants).
    - unmatched: inserted.

    Source must be unique per key (pre-dedup with operators.scd.latest_by).
    """
    if not table_exists(target_path):
        writer = source.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    target = read_table(spark, target_path)
    if partition_col:
        # Fence the rewrite to partitions the source actually touches —
        # bounded driver collect (dates), mirrors the reference's trailing
        # date-window MERGE fences.
        parts = [r[0] for r in source.select(partition_col).distinct().collect()]
        target = target.filter(F.col(partition_col).isin(parts))

    src = source.alias("src")
    tgt = target.alias("tgt")
    cond = [F.col(f"src.{k}").eqNullSafe(F.col(f"tgt.{k}")) for k in keys]
    joined = tgt.join(src, cond, "full_outer")

    cols = []
    for c in source.columns:
        s, t = F.col(f"src.{c}"), F.col(f"tgt.{c}")
        if c in keys:
            cols.append(F.coalesce(s, t).alias(c))
        elif not when_matched_update:
            # insert-only: existing row wins, new keys come from source
            cols.append(F.coalesce(t, s).alias(c))
        elif ignore_null_updates:
            # matched: non-null source fields overwrite; else keep target
            cols.append(F.coalesce(s, t).alias(c))
        else:
            cols.append(
                F.when(F.col(f"src.{keys[0]}").isNotNull(), s).otherwise(t).alias(c)
            )
    merged = joined.select(*cols)

    _rewrite(spark, merged, target_path, partition_col)


def _rewrite(
    spark: SparkSession, df: DataFrame, target_path: str, partition_col: str | None
) -> None:
    """Materialize then swap. With a partition column, dynamic partition
    overwrite replaces only the partitions present in `df`."""
    if partition_col:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return
    tmp = target_path.rstrip("/") + ".__merge_tmp__"
    df.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(target_path + ".__swap__")
    import shutil

    shutil.rmtree(target_path, ignore_errors=True)
    os.rename(target_path + ".__swap__", target_path)
    shutil.rmtree(tmp, ignore_errors=True)
