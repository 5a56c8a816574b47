"""Maintenance operators: compaction reduces file count without changing
data; z-order sort survives; bloom options accepted by the writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators import maintenance as mx


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("block_date"),
        (F.col("id") * 7 % 100).alias("receipt_key"),
    )
    # many small files: one per (partition, repartition slice)
    df.repartition(16).write.partitionBy("block_date").parquet(path)
    before = mx.file_count(spark, path)
    checksum_before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]

    mx.compact_partitions(
        spark,
        path,
        "block_date",
        zorder_cols=["receipt_key"],
        bloom_cols=["receipt_key"],
    )
    after = mx.file_count(spark, path)
    checksum_after = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]

    assert after < before and after <= 3  # one file per partition
    assert checksum_before == checksum_after


def test_partition_scoped_compaction_leaves_others_alone(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("block_date")
    )
    df.repartition(6).write.partitionBy("block_date").parquet(path)
    import glob
    import os

    files_p2_before = set(glob.glob(os.path.join(path, "block_date=2", "*.parquet")))
    mx.compact_partitions(spark, path, "block_date", partitions=["0", "1"])
    files_p2_after = set(glob.glob(os.path.join(path, "block_date=2", "*.parquet")))
    assert files_p2_before == files_p2_after  # untouched partition intact
    assert spark.read.parquet(path).count() == 300


def test_compaction_refuses_log_authoritative_tables(spark, tmp_path):
    """r13 review: a directory-walk rewrite on a Delta-published table
    would resurrect tombstoned rows and delete files the log still
    references — compact_partitions must refuse, pointing at the
    publish-edge/manifest-store alternatives."""
    import os

    import pytest

    path = str(tmp_path / "pub")
    df = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("block_date")
    )
    df.write.partitionBy("block_date").parquet(path)
    os.makedirs(os.path.join(path, "_delta_log"))
    with pytest.raises(ValueError, match="log-authoritative"):
        mx.compact_partitions(spark, path, "block_date")


def test_compaction_target_files_above_one_takes_effect(spark, tmp_path):
    """r13 review: repartition(N, partition_col) hashed ALL rows of one
    partition value into one task, so N>1 silently wrote 1 file and the
    rewrite funneled through one core. The salted keying must yield >1
    file for a partition when N>1 (and data must survive exactly)."""
    import glob
    import os

    path = str(tmp_path / "tbl3")
    df = spark.range(0, 4000).select(
        F.col("id"), F.lit("d0").alias("block_date")
    )
    df.repartition(8).write.partitionBy("block_date").parquet(path)
    checksum_before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    mx.compact_partitions(spark, path, "block_date", target_files_per_partition=4)
    files = glob.glob(os.path.join(path, "block_date=d0", "*.parquet"))
    assert 1 < len(files) <= 4
    assert spark.read.parquet(path).agg(F.sum("id")).collect()[0][0] == checksum_before
