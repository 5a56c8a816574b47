"""SCD Type-1 keyed upsert: the OSS replacement for Databricks DLT
``APPLY CHANGES INTO ... KEYS (...) SEQUENCE BY ... STORED AS SCD TYPE 1``
(reference A8 — SCD tables.sql:14-39,53-77,90-116,129-149).

Semantics reproduced:
- KEYS / SEQUENCE BY: within each micro-batch the row with the highest
  sequence value wins (arg-max via row_number, reference T7); a stored row
  is only replaced by a source row with sequence >= stored sequence, so
  out-of-order batches converge to the same state.
- IGNORE NULL UPDATES: per-column ``coalesce(new, old)`` on update
  (SURVEY §7 hard-parts list).

Streaming: `apply_changes_stream` wraps the batch core in foreachBatch —
the exact pattern SURVEY §4 prescribes for the DLT replacement.

Scale design: state lives in the target table, partitioned however the
caller chose; each batch shuffles only on the key columns. Hot keys are
fine (arg-max is a 1-row-per-key reduction, AQE splits skewed partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.merge import _recover, read_table, table_exists

SEQ_COL = "__scd_seq__"


def latest_by(df: DataFrame, keys: list[str], sequence_by: str) -> DataFrame:
    """Arg-max dedup: latest row per key by the sequence column (ties broken
    deterministically by all remaining columns)."""
    tiebreak = [c for c in df.columns if c not in keys and c != sequence_by]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(sequence_by), *[F.desc(c) for c in tiebreak]
    )
    return df.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop(
        "__rn__"
    )


def apply_changes(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    ignore_null_updates: bool = False,
) -> None:
    """Batch core: upsert `updates` into the SCD1 table at `target_path`."""
    src = latest_by(updates, keys, sequence_by)
    _recover(target_path)
    if not table_exists(target_path):
        src.write.mode("overwrite").parquet(target_path)
        return

    out_cols = list(src.columns)
    tgt = read_table(spark, target_path)
    # Explicit presence markers, not key nullability: eqNullSafe join keys
    # mean a legitimately-NULL key column still matches, and keys[0].isNull()
    # would then bypass the sequence guard (see merge_upsert).
    j = tgt.withColumn("__tgt__", F.lit(True)).alias("t").join(
        src.withColumn("__src__", F.lit(True)).alias("s"),
        [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys],
        "full_outer",
    )
    s_seq, t_seq = F.col(f"s.{sequence_by}"), F.col(f"t.{sequence_by}")
    # A source row applies if the key is new, or its sequence is >= stored.
    src_wins = F.col("t.__tgt__").isNull() | (
        F.col("s.__src__").isNotNull() & (s_seq >= t_seq)
    )
    out = []
    for c in out_cols:
        s, t = F.col(f"s.{c}"), F.col(f"t.{c}")
        if c in keys:
            out.append(F.coalesce(s, t).alias(c))
        elif ignore_null_updates:
            out.append(F.when(src_wins, F.coalesce(s, t)).otherwise(t).alias(c))
        else:
            out.append(F.when(src_wins, s).otherwise(t).alias(c))
    merged = j.select(*out)

    from near_public_lakehouse_spark.operators.merge import _rewrite

    _rewrite(spark, merged, target_path, None)


def apply_changes_stream(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    sequence_by: str,
    checkpoint: str,
    ignore_null_updates: bool = False,
):
    """Streaming APPLY CHANGES: foreachBatch(apply_changes) with
    availableNow semantics left to the caller's trigger choice."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            sequence_by,
            ignore_null_updates=ignore_null_updates,
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# --- SCD Type 2 ------------------------------------------------------------

START_COL = "__scd_start__"
END_COL = "__scd_end__"
CURRENT_COL = "__scd_current__"


def scd2_history(changes: DataFrame, keys: list[str], sequence_by: str) -> DataFrame:
    """Pure transform: a change stream -> SCD2 history rows.

    Collapses same-sequence duplicates (latest_by tiebreak), drops no-op
    changes (all tracked columns equal to the previous version's), then
    derives validity: ``__scd_start__`` = the row's sequence,
    ``__scd_end__`` = next version's sequence (NULL while current),
    ``__scd_current__`` = end is NULL. Gaps-and-islands over one window
    partition per key — a single shuffle on the keys.
    """
    tracked = [c for c in changes.columns if c not in keys and c != sequence_by]
    # Collapse duplicates of the SAME (key, sequence) — unlike SCD1, every
    # distinct sequence value is history and must survive.
    src = latest_by(changes, [*keys, sequence_by], sequence_by)
    w = Window.partitionBy(*keys).orderBy(F.asc(sequence_by))
    same_as_prev = F.lit(True)
    for c in tracked:
        same_as_prev = same_as_prev & F.lag(c).over(w).eqNullSafe(F.col(c))
    # first row per key has lag NULL on every column; eqNullSafe against a
    # non-null value is False there unless the value itself is NULL — guard
    # with an explicit is-first marker instead.
    is_first = F.lag(sequence_by).over(w).isNull()
    changed = src.withColumn("__keep__", is_first | ~same_as_prev).filter(
        F.col("__keep__")
    ).drop("__keep__")
    w2 = Window.partitionBy(*keys).orderBy(F.asc(sequence_by))
    return (
        changed.withColumn(START_COL, F.col(sequence_by))
        .withColumn(END_COL, F.lead(sequence_by).over(w2))
        .withColumn(CURRENT_COL, F.col(END_COL).isNull())
    )


BUCKET_COL = "__scd_bucket__"


def _bucket_of(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def apply_changes_scd2(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    n_buckets: int | None = None,
) -> None:
    """SCD2 APPLY CHANGES batch core: the DLT ``STORED AS SCD TYPE 2``
    analog. History is rebuilt from (stored rows union new changes) per
    key, which makes the operator idempotent and out-of-order-convergent
    by construction — re-applying any batch, in any order, yields the
    same table (the SCD1 convergence discipline, round-2 crash tests).
    Crash-atomicity rides the same park-and-swap `_rewrite` as SCD1/MERGE.

    ``n_buckets`` is the 100 TB path: the table is laid out partitioned on
    a key-hash bucket, a batch reads ONLY the buckets its keys touch
    (partition pruning on the stored side — a batch touching 0.1% of keys
    reads ~0.1% of the table), and `_rewrite` swaps only those partitions;
    untouched partition directories are never opened, rewritten, or
    renamed. The bucket count is a layout constant: changing it is a table
    rewrite, exactly like re-bucketing anywhere else.

    The key->bucket map is deterministic (xxhash64), so the touched-bucket
    list is a bounded (<= n_buckets) driver-side collect — the same
    control-plane pattern as merge.py's partition fencing.
    """
    data_cols = [c for c in updates.columns]
    _recover(target_path)
    if not table_exists(target_path):
        hist = scd2_history(updates, keys, sequence_by)
        writer = hist
        if n_buckets:
            writer = hist.withColumn(BUCKET_COL, _bucket_of(keys, n_buckets))
            writer.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path)
        else:
            writer.write.mode("overwrite").parquet(target_path)
        return

    from near_public_lakehouse_spark.operators.merge import _rewrite

    if not n_buckets:
        stored = read_table(spark, target_path).select(*data_cols)
        hist = scd2_history(stored.unionByName(updates), keys, sequence_by)
        _rewrite(spark, hist, target_path, None)
        return

    touched = [
        r[0]
        for r in updates.select(_bucket_of(keys, n_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    stored = (
        read_table(spark, target_path)
        .filter(F.col(BUCKET_COL).isin(touched))  # partition-pruned scan
        .select(*data_cols)
    )
    hist = scd2_history(stored.unionByName(updates), keys, sequence_by).withColumn(
        BUCKET_COL, _bucket_of(keys, n_buckets)
    )
    _rewrite(spark, hist, target_path, BUCKET_COL)


def scd2_stream(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    sequence_by: str,
    checkpoint: str,
    n_buckets: int | None = None,
):
    """Streaming SCD2: foreachBatch(apply_changes_scd2).

    ``n_buckets`` MUST be forwarded for large dimensions: without it every
    micro-batch takes the full-history-rewrite branch of
    `apply_changes_scd2`, rewriting the entire table per batch — the exact
    hazard the key-hash bucketed layout exists to avoid at scale.
    """

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes_scd2(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            sequence_by,
            n_buckets=n_buckets,
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
