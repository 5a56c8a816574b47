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


def _recover(target_path: str) -> None:
    """Re-install data parked by a crashed `_rewrite` swap.

    A crash between parking a live partition (or the unpartitioned target)
    and installing its replacement leaves that data ONLY in ``.__old__``.
    Before anything reads the target or cleans up the parked dir, restore
    every parked partition whose live dir is missing — for the
    unpartitioned layout, the whole parked dir when the target is absent.
    After recovery the target is a complete pre-swap (or mixed old/new,
    both per-partition-consistent) table and the merge recompute is safe.

    When the target EXISTS, only partition dirs (``col=value``) and
    control-plane sidecars (``_``-prefixed, e.g. ``_delta_log``) are
    restored: an unpartitioned crash AFTER the install leaves the old
    loose part-files in the parked dir, and re-installing those beside
    the already-swapped-in replacement would duplicate every pre-merge
    row (old and new part-file names never collide).
    """
    base = target_path.rstrip("/")
    parked = base + ".__old__"
    if not os.path.isdir(parked):
        return
    if not os.path.isdir(target_path):
        os.rename(parked, target_path)
        return
    for name in os.listdir(parked):
        live = os.path.join(target_path, name)
        src = os.path.join(parked, name)
        if os.path.exists(live):
            continue
        if name.startswith("_") or ("=" in name and os.path.isdir(src)):
            os.rename(src, live)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _partition_fence(source: DataFrame, partition_col: str):
    """(touched partition values, null-safe fence column) for a keyed
    MERGE: one bounded driver collect of the source's distinct partition
    values, mirroring the reference's trailing date-window MERGE fences.
    Null-safe because isin() never matches NULL — an unguarded fence
    would exclude the null partition's target rows from the join and let
    the swap replace __HIVE_DEFAULT_PARTITION__ with source-only rows.
    Shared by both merge paths (r13 review: the two copies had already
    begun to drift)."""
    parts = [r[0] for r in source.select(partition_col).distinct().collect()]
    fence = F.col(partition_col).isin([p for p in parts if p is not None])
    if any(p is None for p in parts):
        fence = fence | F.col(partition_col).isNull()
    return parts, fence


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    when_matched_update: bool = True,
    ignore_null_updates: bool = False,
) -> list | None:
    """MERGE `source` into the parquet table at `target_path` on `keys`.

    - matched + `when_matched_update`: source row wins (per-column
      ``coalesce(src, tgt)`` when `ignore_null_updates`, the reference's
      `IGNORE NULL UPDATES` — SCD tables.sql A8 / SURVEY §7 hard-parts).
    - matched + not `when_matched_update`: insert-only MERGE (reference
      `WHEN NOT MATCHED INSERT *` variants).
    - unmatched: inserted.

    Source must be unique per key (pre-dedup with operators.scd.latest_by),
    and `partition_col` must be STABLE per key: the fence only rewrites
    partitions the source touches, so an update that MOVES a key to a new
    partition value would leave the stale copy live in its old partition
    (the same contract every partition-pruned Delta MERGE carries; the
    published tables satisfy it because block_date is deterministic per
    key — r13 review).

    Returns the distinct `partition_col` values the merge touched (the
    fence list), or None when unpartitioned / initial full write — callers
    that maintain control-plane sidecars (delta_export.sync_delta_log_from_dir)
    use it to diff only the touched partition dirs.
    """
    _recover(target_path)
    if not table_exists(target_path):
        writer = source.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return None

    target = read_table(spark, target_path)
    parts: list | None = None
    if partition_col:
        parts, fence = _partition_fence(source, partition_col)
        target = target.filter(fence)

    merged = merged_frame(
        target,
        source,
        keys,
        when_matched_update=when_matched_update,
        ignore_null_updates=ignore_null_updates,
    )

    _rewrite(spark, merged, target_path, partition_col)
    return parts


def merged_frame(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched_update: bool = True,
    ignore_null_updates: bool = False,
) -> DataFrame:
    """The MERGE result as a DataFrame (shared by the path-based
    `merge_upsert` and the versioned-table `versioned_upsert`)."""
    # Presence is tracked with explicit markers, NOT key nullability: the
    # join uses eqNullSafe, so a row whose first key column is legitimately
    # NULL still matches — keys[0].isNotNull() would misclassify it and
    # silently drop the update.
    src = source.withColumn("__src__", F.lit(True)).alias("src")
    tgt = target.withColumn("__tgt__", F.lit(True)).alias("tgt")
    cond = [F.col(f"src.{k}").eqNullSafe(F.col(f"tgt.{k}")) for k in keys]
    joined = tgt.join(src, cond, "full_outer")
    src_present = F.col("src.__src__").isNotNull()
    tgt_present = F.col("tgt.__tgt__").isNotNull()

    cols = []
    for c in source.columns:
        s, t = F.col(f"src.{c}"), F.col(f"tgt.{c}")
        if c in keys:
            cols.append(F.when(src_present, s).otherwise(t).alias(c))
        elif not when_matched_update:
            # insert-only: existing row wins (even its NULL fields), new
            # keys come from source
            cols.append(F.when(tgt_present, t).otherwise(s).alias(c))
        elif ignore_null_updates:
            # matched: non-null source fields overwrite; else keep target
            cols.append(F.coalesce(s, t).alias(c))
        else:
            cols.append(F.when(src_present, s).otherwise(t).alias(c))
    return joined.select(*cols)


def _rewrite(
    spark: SparkSession,
    df: DataFrame,
    target_path: str,
    partition_col: str | None,
    writer_options: dict[str, str] | None = None,
) -> None:
    """Materialize-then-swap, crash-safe for both layouts.

    The merged plan's lineage still reads `target_path` (the full-outer
    join), so the result is ALWAYS materialized to a sibling tmp dir first
    — never written onto the path it reads. The swap is then pure
    filesystem renames with no Spark job in flight:

    - unpartitioned: one directory rename (old parked, then dropped);
    - partitioned: one rename per touched partition, with the old
      partition parked OUTSIDE the table root (a parked dir named
      ``col=value.__old__`` inside the root would be misparsed as a
      partition value on read). A crash mid-swap leaves every partition
      either fully-old or fully-new — never half-written — and the tmp
      dir survives for re-apply.

    This replaces the round-1 dynamic-partition-overwrite path, which
    wrote directly onto the table while reading it and leaked the session
    conf `spark.sql.sources.partitionOverwriteMode=dynamic`.
    """
    import shutil

    base = target_path.rstrip("/")
    tmp = base + ".__merge_tmp__"
    parked = base + ".__old__"
    # If a prior swap crashed between park and install, the parked dir
    # holds the only copy of some partitions — re-install before cleanup.
    _recover(target_path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(parked, ignore_errors=True)

    writer = df.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(tmp)

    if not partition_col:
        os.rename(target_path, parked)
        os.rename(tmp, target_path)
        # Control-plane sidecars (``_delta_log``, schema sidecars) live
        # inside the table root but are not produced by the rewrite —
        # carry them across the swap before the old data is dropped.
        for name in os.listdir(parked):
            if name.startswith("_") and not os.path.exists(
                os.path.join(target_path, name)
            ):
                os.rename(
                    os.path.join(parked, name), os.path.join(target_path, name)
                )
        shutil.rmtree(parked, ignore_errors=True)
        return

    os.makedirs(parked, exist_ok=True)
    for name in sorted(os.listdir(tmp)):
        new_part = os.path.join(tmp, name)
        if not (os.path.isdir(new_part) and "=" in name):
            continue
        live_part = os.path.join(target_path, name)
        if os.path.isdir(live_part):
            os.rename(live_part, os.path.join(parked, name))
        os.rename(new_part, live_part)
    shutil.rmtree(parked, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def merge_upsert_logged(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    when_matched_update: bool = True,
    ignore_null_updates: bool = False,
) -> tuple[list | None, list[str]]:
    """Log-authoritative MERGE for tables whose live file set is defined
    by their `_delta_log` (the published Delta tables): the target is read
    from the snapshot's LIVE files — on-disk tombstones are invisible —
    the merged touched partitions are written to a sibling tmp dir, and
    the new part-files are installed IN PLACE beside the superseded ones.
    Returns (touched_partition_values, installed_relpaths); the caller
    commits the diff with
    `delta_export.sync_delta_log_from_dir(live_files=installed, ...)`.

    Superseded part-files are NOT deleted (unlike `merge_upsert`'s swap):
    they stay on disk as log tombstones until
    `delta_export.vacuum_delta_table` drops the ones unreferenced past
    the retention window — the Delta retention story (reference pairs
    every scheduled MERGE with OPTIMIZE/VACUUM, `NB/Epochs and validators
    Silver Pipeline.py:95-96`), which keeps time travel replayable inside
    the window.

    Shares `merge_upsert`'s contracts: source unique per key, and
    `partition_col` STABLE per key (the fence only rewrites touched
    partitions — a key that moved partitions would leave its stale copy
    live; block_date is deterministic per key for every published table).

    Crash safety is INHERENT here, with no intent marker: nothing mutates
    the log-defined live state until the sync commit, so a crash at any
    point (tmp write, install, pre-sync) leaves only unreferenced orphan
    files that vacuum sweeps; the next publish re-merges from the
    unchanged log state and is idempotent. Part-file names carry the
    writing job's UUID, so installs never collide with live files,
    tombstones, or prior crash orphans."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
    )

    reader = DeltaLogReader(table_dir)
    parts: list | None = None
    if partition_col:
        parts, fence = _partition_fence(source, partition_col)
        # Prune the target read to the touched partitions through the
        # protocol reader's data skipping (null-safe 'in'): per-publish
        # read cost is O(files in touched partitions), not O(table).
        # Serialization via partition_value_str: str(True) is 'True' but
        # the stored pv (and hive dir) is 'true' — the one mismatch that
        # both broke boolean scoping and disabled pruning (r12 review).
        from near_public_lakehouse_spark.operators.delta_export import (
            partition_value_str,
        )

        pv_strs = [partition_value_str(p) for p in parts]
        target = reader.to_df(spark, where=[(partition_col, "in", pv_strs)])
        target = target.filter(fence)
    else:
        target = reader.to_df(spark)

    merged = merged_frame(
        target,
        source,
        keys,
        when_matched_update=when_matched_update,
        ignore_null_updates=ignore_null_updates,
    )
    installed = _install_in_place(merged, table_dir, partition_col)
    return parts, installed


def _install_in_place(
    df: DataFrame, table_dir: str, partition_col: str | None
) -> list[str]:
    """Materialize `df` to a sibling tmp dir (the plan reads the table it
    replaces, same rule as `_rewrite`), then move the part-files into the
    live partition dirs WITHOUT touching existing files. Returns the
    installed table-relative paths, sorted."""
    import shutil

    base = table_dir.rstrip("/")
    tmp = base + ".__merge_tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)

    installed: list[str] = []
    if partition_col:
        for name in sorted(os.listdir(tmp)):
            src_dir = os.path.join(tmp, name)
            if not (os.path.isdir(src_dir) and "=" in name):
                continue
            dst_dir = os.path.join(table_dir, name)
            os.makedirs(dst_dir, exist_ok=True)
            for fn in sorted(os.listdir(src_dir)):
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    os.rename(
                        os.path.join(src_dir, fn), os.path.join(dst_dir, fn)
                    )
                    installed.append(f"{name}/{fn}")
    else:
        for fn in sorted(os.listdir(tmp)):
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                os.rename(os.path.join(tmp, fn), os.path.join(table_dir, fn))
                installed.append(fn)
    shutil.rmtree(tmp, ignore_errors=True)
    return installed
