"""Historical backfill in bounded date slices (K3).

The reference backfills from genesis in <=1-year date-range chunks so no
single load job scans unbounded history (BQ Writer Backfill from Genesis
2020-07-21.py:58-62,157-159). Same shape here: one MERGE per slice, each
fenced to its date range — partition pruning makes every slice job
O(slice), and a failed slice reruns idempotently (MERGE keys dedupe).
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.merge import merge_upsert


def date_slices(start: date, end: date, slice_days: int) -> list[tuple[date, date]]:
    """Inclusive [start, end] split into [lo, hi] windows of <= slice_days."""
    if slice_days < 1:
        # guard: 0 would make `cur` never advance — an infinite driver
        # loop appending empty slices until OOM (r13 review)
        raise ValueError(f"slice_days must be >= 1, got {slice_days}")
    out = []
    cur = start
    while cur <= end:
        hi = min(cur + timedelta(days=slice_days - 1), end)
        out.append((cur, hi))
        cur = hi + timedelta(days=1)
    return out


def backfill_by_slices(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: list[str],
    date_col: str,
    start: date,
    end: date,
    slice_days: int = 365,
    partition_col: str | None = None,
) -> int:
    """MERGE `source` into `target_path` one date slice at a time; returns
    the number of slices executed. `date_col` bounds push down to the scan,
    so each slice reads only its window."""
    slices = date_slices(start, end, slice_days)
    for lo, hi in slices:
        chunk = source.filter(
            (F.col(date_col) >= F.lit(lo)) & (F.col(date_col) <= F.lit(hi))
        )
        merge_upsert(spark, target_path, chunk, keys, partition_col=partition_col)
    return len(slices)
