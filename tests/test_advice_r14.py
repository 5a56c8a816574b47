"""Regression tests for the four round-13 ADVICE findings (fixed r14).

1. scd.py — SCD2 tables written before the SEQS_COL format must keep
   applying (backward-compatible `_stored_changes` fallback).
2. maintenance.py — compact_partitions salting must not hash() map
   columns (AnalysisException on Spark's default conf).
3. delta_export.py — `_log_has_removes` parses defensively: corrupt
   lines fail CLOSED; a top-level JSON string never substring-matches.
4. publish.py — the marker replay fence is configurable; None keeps
   every marker for deep checkpoint rollbacks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


# --- 1. SCD2 pre-r13 on-disk format ----------------------------------------


def _hist(spark, path):
    from near_public_lakehouse_spark.operators.scd import (
        CURRENT_COL,
        END_COL,
        START_COL,
    )

    return sorted(
        (
            (r.k, r.v, r[START_COL], r[END_COL], r[CURRENT_COL])
            for r in spark.read.parquet(path).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )


def _strip_seqs(spark, path, tmp_path, name):
    """Rewrite an SCD2 table without SEQS_COL — the pre-r13 layout."""
    from near_public_lakehouse_spark.operators.scd import SEQS_COL

    rows = spark.read.parquet(path).drop(SEQS_COL)
    old = str(tmp_path / name)
    rows.write.parquet(old)
    return old


def test_scd2_applies_to_pre_seqs_table(spark, tmp_path):
    from near_public_lakehouse_spark.operators.scd import (
        SEQS_COL,
        apply_changes_scd2,
    )

    seeded = str(tmp_path / "seeded")
    apply_changes_scd2(
        spark,
        seeded,
        spark.createDataFrame(
            [(1, "a", 10), (1, "b", 20), (2, "x", 10)], "k int, v string, seq int"
        ),
        ["k"],
        "seq",
    )
    old = _strip_seqs(spark, seeded, tmp_path, "old_fmt")
    assert SEQS_COL not in spark.read.parquet(old).columns

    # ADVICE r13: this used to raise an unresolved-column AnalysisException
    # on __scd_seqs__, wedging every pre-r13 checkpointed pipeline.
    apply_changes_scd2(
        spark,
        old,
        spark.createDataFrame([(1, "c", 30), (2, "x", 25)], "k int, v string, seq int"),
        ["k"],
        "seq",
    )
    assert _hist(spark, old) == [
        (1, "a", 10, 20, False),
        (1, "b", 20, 30, False),
        (1, "c", 30, None, True),
        (2, "x", 10, None, True),  # (2,'x',25) is a reaffirming no-op
    ]
    # and the rewrite migrated the table to the SEQS_COL layout
    assert SEQS_COL in spark.read.parquet(old).columns


def test_scd2_pre_seqs_bucketed_path(spark, tmp_path):
    from near_public_lakehouse_spark.operators.scd import (
        BUCKET_COL,
        SEQS_COL,
        apply_changes_scd2,
    )

    seeded = str(tmp_path / "seeded_b")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "x", 10)], "k int, v string, seq int"
    )
    apply_changes_scd2(spark, seeded, df, ["k"], "seq", n_buckets=4)
    # strip SEQS_COL but keep the bucket layout
    stored = spark.read.parquet(seeded).drop(SEQS_COL)
    old = str(tmp_path / "old_b")
    stored.write.partitionBy(BUCKET_COL).parquet(old)

    apply_changes_scd2(
        spark,
        old,
        spark.createDataFrame([(1, "b", 20)], "k int, v string, seq int"),
        ["k"],
        "seq",
        n_buckets=4,
    )
    assert _hist(spark, old) == [
        (1, "a", 10, 20, False),
        (1, "b", 20, None, True),
        (2, "x", 10, None, True),
    ]


# --- 2. compact_partitions over map columns ---------------------------------


def test_compaction_salts_around_map_columns(spark, tmp_path):
    """ADVICE r13: F.hash(*all columns) raises AnalysisException on
    MapType inputs under Spark's default conf; the salt must skip maps."""
    import glob

    from near_public_lakehouse_spark.operators import maintenance as mx

    path = str(tmp_path / "maptbl")
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.create_map(F.lit("a"), F.col("id").cast("double")).alias("props"),
        F.lit("d0").alias("block_date"),
    )
    df.repartition(8).write.partitionBy("block_date").parquet(path)
    before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    mx.compact_partitions(spark, path, "block_date", target_files_per_partition=3)
    files = glob.glob(os.path.join(path, "block_date=d0", "*.parquet"))
    assert 1 < len(files) <= 3
    out = spark.read.parquet(path)
    assert out.agg(F.sum("id")).collect()[0][0] == before
    assert out.select(F.map_keys("props")[0]).distinct().collect()[0][0] == "a"


# --- 3. _log_has_removes defensive parse ------------------------------------


def _write_log(tmp_path, name, lines):
    log = str(tmp_path / name)
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return log


def test_log_has_removes_fails_closed_on_corrupt_line(tmp_path):
    from near_public_lakehouse_spark.operators.delta_export import _log_has_removes

    log = _write_log(tmp_path, "corrupt", ['{"add": {"path": "a.parquet"'])
    assert _log_has_removes(log)  # parse failure => refuse the reconcile


def test_log_has_removes_ignores_top_level_json_string(tmp_path):
    from near_public_lakehouse_spark.operators.delta_export import _log_has_removes

    log = _write_log(
        tmp_path,
        "strline",
        [json.dumps("please remove nothing"), json.dumps({"add": {"path": "a"}})],
    )
    assert not _log_has_removes(log)  # no substring match on non-dict lines


def test_log_has_removes_still_detects_real_removes(tmp_path):
    from near_public_lakehouse_spark.operators.delta_export import _log_has_removes

    log = _write_log(
        tmp_path, "real", [json.dumps({"remove": {"path": "gone.parquet"}})]
    )
    assert _log_has_removes(log)


# --- 4. configurable replay fence -------------------------------------------


def _run_publisher(spark, src, msgs_root, state, ckpt, fence):
    from near_public_lakehouse_spark.operators.publish import (
        file_transport_factory,
        publish_stream,
    )

    stream = (
        spark.readStream.schema("seq long, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = publish_stream(
        stream,
        file_transport_factory(msgs_root),
        state,
        key_col="key",
        seq_col="seq",
        checkpoint_path=ckpt,
        replay_fence=fence,
    )
    q.awaitTermination(120)


def _make_batches(spark, src, n):
    for i in range(n):
        spark.createDataFrame(
            [(i * 10 + s, f"k{s}") for s in range(10)], "seq long, key string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i:02d}")


def test_replay_fence_none_keeps_every_marker(spark, tmp_path):
    src = str(tmp_path / "src")
    _make_batches(spark, src, 5)
    state = str(tmp_path / "state")
    _run_publisher(
        spark, f"{src}/b*", str(tmp_path / "msgs"), state, str(tmp_path / "ck"), None
    )
    markers = sorted(os.listdir(f"{state}/published"))
    assert markers == [f"batch_{i}" for i in range(5)]


def test_replay_fence_prunes_old_markers(spark, tmp_path):
    src = str(tmp_path / "src2")
    _make_batches(spark, src, 5)
    state = str(tmp_path / "state2")
    _run_publisher(
        spark, f"{src}/b*", str(tmp_path / "msgs2"), state, str(tmp_path / "ck2"), 2
    )
    markers = sorted(os.listdir(f"{state}/published"))
    # fence=2 sweeps every batch: only the trailing window survives
    assert f"batch_{4}" in markers and f"batch_{0}" not in markers
    assert len(markers) <= 3
