"""Batch readers for the driver-generated parquet tables (TESTDATA.md).

At 100 TB these reads are the dominant cost, so everything stays on the
vectorized parquet scan path: no Python row handling, explicit column
selection happens in the caller (Catalyst prunes to the parquet footer --
check `.explain` for ReadSchema), and partition discovery is Spark's own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Pin `events.ts` to the engine contract: BIGINT nanoseconds-since-epoch.

    The driver's generator has shipped the column under two parquet
    encodings so far — TIMESTAMP(NANOS) (reads as BIGINT ns under
    `nanosAsLong`, already in contract) and timestamp[us] (reads as
    TIMESTAMP / TIMESTAMP_NTZ). Normalizing at the single load seam keeps
    every downstream ns-arithmetic query encoding-agnostic. The session
    zone is pinned UTC (session.py), so the NTZ->TIMESTAMP cast is the
    identity and `unix_micros` is deterministic.
    """
    if "ts" not in df.columns:
        return df
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Applies runtime confs first so nanosecond
    parquet timestamps (events.ts) read as BIGINT under any session, and
    normalizes `events.ts` to ns BIGINT regardless of parquet encoding."""
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
