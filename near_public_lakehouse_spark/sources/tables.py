"""Batch readers for the driver-generated parquet tables (TESTDATA.md).

At 100 TB these reads are the dominant cost, so everything stays on the
vectorized parquet scan path: no Python row handling, explicit column
selection happens in the caller (Catalyst prunes to the parquet footer --
check `.explain` for ReadSchema), and partition discovery is Spark's own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from near_public_lakehouse_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Applies runtime confs first so nanosecond
    parquet timestamps (events.ts) read as BIGINT under any session."""
    configure_runtime(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
