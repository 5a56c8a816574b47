"""K4 hourly export: folder scheme, idempotent overwrite, schema round-trip."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.export import (
    avro_available,
    export_hourly,
    hourly_export_path,
)


def test_hourly_export_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), F.lit("x").alias("tag")
    )
    ts = datetime(2026, 8, 13, 14)
    path = export_hourly(df, str(tmp_path), "accounts", ts)
    fmt = "avro" if avro_available(spark) else "parquet"
    assert path == hourly_export_path(str(tmp_path), fmt, "accounts", ts)
    assert "/accounts/2026/08/13/14" in path
    back = spark.read.format(fmt).load(path)
    assert back.count() == 100
    assert back.columns == ["id", "bucket", "tag"]


def test_hourly_export_idempotent_rerun(spark, tmp_path):
    ts = datetime(2026, 8, 13, 15)
    df1 = spark.range(10).select(F.col("id"))
    df2 = spark.range(7).select(F.col("id"))
    export_hourly(df1, str(tmp_path), "logs", ts)
    path = export_hourly(df2, str(tmp_path), "logs", ts)
    fmt = "avro" if avro_available(spark) else "parquet"
    # Rerun of the same hour replaces, never appends.
    assert spark.read.format(fmt).load(path).count() == 7
