"""Unit tests for the engine operators: MERGE upsert and SCD1 APPLY CHANGES
(sequence guard, IGNORE NULL UPDATES, out-of-order convergence)."""

from __future__ import annotations

import pytest

from near_public_lakehouse_spark.operators.merge import merge_upsert
from near_public_lakehouse_spark.operators.scd import apply_changes, latest_by


@pytest.fixture
def target(tmp_path):
    return str(tmp_path / "tbl")


def _rows(spark, path):
    return {
        r.k: (r.v, r.seq) for r in spark.read.parquet(path).collect()
    }


def test_merge_insert_and_update(spark, target):
    df1 = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], "k int, v string, seq int")
    merge_upsert(spark, target, df1, ["k"])
    df2 = spark.createDataFrame([(2, "B", 20), (3, "c", 20)], "k int, v string, seq int")
    merge_upsert(spark, target, df2, ["k"])
    assert _rows(spark, target) == {1: ("a", 10), 2: ("B", 20), 3: ("c", 20)}


def test_merge_insert_only(spark, target):
    df1 = spark.createDataFrame([(1, "a", 1)], "k int, v string, seq int")
    merge_upsert(spark, target, df1, ["k"])
    df2 = spark.createDataFrame([(1, "X", 2), (2, "b", 2)], "k int, v string, seq int")
    merge_upsert(spark, target, df2, ["k"], when_matched_update=False)
    assert _rows(spark, target) == {1: ("a", 1), 2: ("b", 2)}


def test_merge_ignore_null_updates(spark, target):
    df1 = spark.createDataFrame([(1, "a", 1)], "k int, v string, seq int")
    merge_upsert(spark, target, df1, ["k"])
    df2 = spark.createDataFrame([(1, None, 2)], "k int, v string, seq int")
    merge_upsert(spark, target, df2, ["k"], ignore_null_updates=True)
    assert _rows(spark, target) == {1: ("a", 2)}


def test_scd_sequence_guard_rejects_stale(spark, target):
    apply_changes(
        spark,
        target,
        spark.createDataFrame([(1, "new", 100)], "k int, v string, seq int"),
        ["k"],
        "seq",
    )
    # stale update (seq 50 < stored 100) must NOT apply
    apply_changes(
        spark,
        target,
        spark.createDataFrame([(1, "old", 50)], "k int, v string, seq int"),
        ["k"],
        "seq",
    )
    assert _rows(spark, target) == {1: ("new", 100)}


def test_scd_out_of_order_batches_converge(spark, target):
    """Same rows split across batches in any order -> same final state
    (reference T7: SEQUENCE BY resolves out-of-order arrival)."""
    rows = [(1, "v1", 10), (1, "v3", 30), (1, "v2", 20), (2, "w2", 20), (2, "w1", 10)]
    batches = [rows[2:], rows[:2], rows[4:]]
    for b in batches:
        apply_changes(
            spark,
            target,
            spark.createDataFrame(b, "k int, v string, seq int"),
            ["k"],
            "seq",
        )
    assert _rows(spark, target) == {1: ("v3", 30), 2: ("w2", 20)}


def test_scd_ignore_null_updates_preserves_columns(spark, target):
    apply_changes(
        spark,
        target,
        spark.createDataFrame([(1, "a", "x", 10)], "k int, v string, w string, seq int"),
        ["k"],
        "seq",
    )
    apply_changes(
        spark,
        target,
        spark.createDataFrame([(1, None, "y", 20)], "k int, v string, w string, seq int"),
        ["k"],
        "seq",
        ignore_null_updates=True,
    )
    r = spark.read.parquet(target).collect()[0]
    assert (r.v, r.w, r.seq) == ("a", "y", 20)


def test_latest_by_argmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 5)], "k int, v string, seq int"
    )
    out = {r.k: r.v for r in latest_by(df, ["k"], "seq").collect()}
    assert out == {1: "b", 2: "c"}


def test_merge_partition_scoped(spark, target):
    """Partition-fenced MERGE: untouched partitions must survive."""
    df1 = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "k int, v string, d string"
    )
    merge_upsert(spark, target, df1, ["k"], partition_col="d")
    df2 = spark.createDataFrame([(2, "B", "2024-01-02")], "k int, v string, d string")
    merge_upsert(spark, target, df2, ["k"], partition_col="d")
    # partition-dir values read back type-inferred (dates here)
    out = {r.k: (r.v, str(r.d)) for r in spark.read.parquet(target).collect()}
    assert out == {1: ("a", "2024-01-01"), 2: ("B", "2024-01-02")}
