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

def _orderable(dt) -> bool:
    """Spark can ORDER BY atomics, arrays and structs of orderables —
    but never maps (AnalysisException); skip them in tiebreaks."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def latest_by(df: DataFrame, keys: list[str], sequence_by: str) -> DataFrame:
    """Arg-max dedup: latest row per key by the sequence column (ties broken
    deterministically by the remaining ORDERABLE columns — map-typed
    columns can't ORDER BY and are skipped, r13 review)."""
    types = {f.name: f.dataType for f in df.schema.fields}
    tiebreak = [
        c
        for c in df.columns
        if c not in keys and c != sequence_by and _orderable(types[c])
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(sequence_by), *[F.desc(c) for c in tiebreak]
    )
    return df.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop(
        "__rn__"
    )


def _align_columns(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Null-fill each frame's missing columns so both carry the UNION of
    the two schemas (a's column order first) — the sidecar drift policy
    applied at the operator level."""
    a_types = {f.name: f.dataType for f in a.schema.fields}
    b_types = {f.name: f.dataType for f in b.schema.fields}
    for c in [c for c in b.columns if c not in a_types]:
        a = a.withColumn(c, F.lit(None).cast(b_types[c]))
    for c in [c for c in a_types if c not in b_types]:
        b = b.withColumn(c, F.lit(None).cast(a_types[c]))
    return a, b.select(*a.columns)


def apply_changes(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    ignore_null_updates: bool = False,
    n_buckets: int | None = None,
) -> None:
    """Batch core: upsert `updates` into the SCD1 table at `target_path`.

    ``n_buckets`` is the 100 TB path SCD2 already had (r13 review: SCD1
    rewrote its ENTIRE state per micro-batch): the table is laid out
    partitioned on a key-hash bucket, a batch reads and rewrites ONLY the
    buckets its keys touch, untouched partition dirs are never opened.
    Same layout-constant contract as `apply_changes_scd2`."""
    src = latest_by(updates, keys, sequence_by)
    _recover(target_path)
    if not table_exists(target_path):
        if n_buckets:
            src.withColumn(BUCKET_COL, _bucket_of(keys, n_buckets)).write.mode(
                "overwrite"
            ).partitionBy(BUCKET_COL).parquet(target_path)
        else:
            src.write.mode("overwrite").parquet(target_path)
        return

    if n_buckets:
        touched = [
            r[0]
            for r in src.select(_bucket_of(keys, n_buckets).alias("b"))
            .distinct()
            .collect()
        ]
        tgt = (
            read_table(spark, target_path)
            .filter(F.col(BUCKET_COL).isin(touched))  # partition-pruned scan
            .drop(BUCKET_COL)
        )
    else:
        tgt = read_table(spark, target_path)
    # Schema drift (T8, r13 review): after a restart with a widened
    # stream schema the batch carries columns the stored table lacks
    # (and vice versa after a source narrowed) — align both sides to the
    # UNION with null-fill, the sidecar policy (drift-as-nulls, never a
    # drop), instead of failing analysis or silently dropping data.
    src, tgt = _align_columns(src, tgt)
    out_cols = list(src.columns)
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
    # NULL guard (r13 review): a stored NULL sequence must LOSE to any
    # arriving update — bare `s_seq >= NULL` is SQL NULL, which made
    # `False | NULL` falsy and the NULL-sequence row immortal.
    src_wins = F.col("t.__tgt__").isNull() | (
        F.col("s.__src__").isNotNull() & (t_seq.isNull() | (s_seq >= t_seq))
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

    if n_buckets:
        merged = merged.withColumn(BUCKET_COL, _bucket_of(keys, n_buckets))
        _rewrite(spark, merged, target_path, BUCKET_COL)
    else:
        _rewrite(spark, merged, target_path, None)


def apply_changes_stream(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    sequence_by: str,
    checkpoint: str,
    ignore_null_updates: bool = False,
    n_buckets: int | None = None,
):
    """Streaming APPLY CHANGES: foreachBatch(apply_changes) with
    availableNow semantics left to the caller's trigger choice.
    Forward ``n_buckets`` for large dimensions (see apply_changes)."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            sequence_by,
            ignore_null_updates=ignore_null_updates,
            n_buckets=n_buckets,
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
# Every sequence value observed inside a version's value-run — retained so
# rebuilds see the COMPLETE change set (see scd2_history's convergence note).
SEQS_COL = "__scd_seqs__"


def scd2_history(changes: DataFrame, keys: list[str], sequence_by: str) -> DataFrame:
    """Pure transform: a change stream -> SCD2 history rows.

    Collapses same-sequence duplicates (latest_by tiebreak), groups
    consecutive equal-value changes into RUNS (gaps-and-islands), and
    emits one version row per run: ``__scd_start__`` = the run's first
    sequence, ``__scd_end__`` = next run's start (NULL while current),
    ``__scd_current__`` = end is NULL — so a reaffirming no-op change
    never opens a version. One shuffle on the keys.

    CONVERGENCE (r13 review): the run's FULL sequence set rides along in
    ``__scd_seqs__``. The r12 form dropped no-op rows outright, which
    made `apply_changes_scd2` order-SENSITIVE: with {A@1 x, A@3 x}
    applied first, the reaffirmation at 3 was unrecoverable, so a late
    {A@2 y} rebuilt to current=y@2 where the all-at-once order yields
    x@3. Retaining every observed (key, sequence) makes the stored state
    the exact SET of changes ever applied — set union is order-free, so
    the rebuild is a pure function of the inputs again.
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
    runs = src.withColumn(
        "__run__",
        F.sum((is_first | ~same_as_prev).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # One row per run (its first — all rows in a run share tracked values
    # by construction), carrying the run's full sequence list. Window
    # aggregates, not groupBy: tracked columns may be ungroupable types.
    wrun = Window.partitionBy(*keys, "__run__")
    first_in_run = F.row_number().over(wrun.orderBy(F.asc(sequence_by)))
    collapsed = (
        runs.withColumn(
            SEQS_COL,
            F.sort_array(
                F.collect_list(sequence_by).over(
                    wrun.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
            ),
        )
        .withColumn("__rn__", first_in_run)
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__run__")
    )
    return (
        collapsed.withColumn(START_COL, F.col(sequence_by))
        .withColumn(END_COL, F.lead(sequence_by).over(w))
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
    _recover(target_path)
    internal = {START_COL, END_COL, CURRENT_COL, SEQS_COL, BUCKET_COL}

    def _stored_changes(stored: DataFrame) -> DataFrame:
        # Recover the COMPLETE change set from history rows: one change
        # per sequence the run observed (reaffirming no-ops included),
        # not just the run representative — the convergence requirement
        # (see scd2_history). Column set comes from the STORED schema
        # (minus the SCD internals), then aligns with the updates via
        # _align_columns — schema drift in either direction null-fills
        # instead of failing the select (r13 review).
        data = [
            c for c in stored.columns if c not in internal and c != sequence_by
        ]
        if SEQS_COL not in stored.columns:
            # Pre-r13 on-disk format: versions carry no sequence-set
            # column. Each stored version contributes its own start
            # sequence as the (only) observed change — the r12-era
            # semantics — so old tables keep applying instead of dying
            # on an unresolved-column AnalysisException, and the next
            # rewrite migrates them to the SEQS_COL layout (ADVICE r13).
            return stored.select(*data, F.col(sequence_by))
        return stored.select(*data, F.explode(SEQS_COL).alias(sequence_by))

    if not table_exists(target_path):
        hist = scd2_history(updates, keys, sequence_by)
        if n_buckets:
            hist = hist.withColumn(BUCKET_COL, _bucket_of(keys, n_buckets))
            hist.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path)
        else:
            hist.write.mode("overwrite").parquet(target_path)
        return

    from near_public_lakehouse_spark.operators.merge import _rewrite

    if not n_buckets:
        stored = _stored_changes(read_table(spark, target_path))
        upd, stored = _align_columns(updates, stored)
        hist = scd2_history(stored.unionByName(upd), keys, sequence_by)
        _rewrite(spark, hist, target_path, None)
        return

    touched = [
        r[0]
        for r in updates.select(_bucket_of(keys, n_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    stored = _stored_changes(
        read_table(spark, target_path)
        .filter(F.col(BUCKET_COL).isin(touched))  # partition-pruned scan
    )
    upd, stored = _align_columns(updates, stored)
    hist = scd2_history(stored.unionByName(upd), keys, sequence_by).withColumn(
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
