"""Bronze ingest: glob-filtered JSON file source, batch or streaming.

OSS replacement for Databricks Autoloader (reference S1 — Mainnet
Loader.py:20-42): `cloudFiles` becomes the built-in file stream source with
an explicit schema (schemas.py) and a checkpoint instead of
`schemaLocation`; `pathGlobFilter` replaces the `*block.json` /
`*shard*.json` glob options.

Scale notes: the file source lists incrementally and tracks seen files in
the checkpoint (reference relies on `cloudFiles.useIncrementalListing` —
SURVEY §4); `maxFilesPerTrigger` bounds micro-batch size the way Autoloader
does. One source definition serves both the S3-tail Rust services (S6) and
the loader notebooks — it's all the same file wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from near_public_lakehouse_spark.plans.schemas import BLOCK_SCHEMA, SHARD_SCHEMA
from near_public_lakehouse_spark.session import configure_runtime


def _reader(spark: SparkSession, streaming: bool, max_files: int | None):
    configure_runtime(spark)
    if max_files is not None and max_files < 1:
        raise ValueError(f"max_files must be >= 1, got {max_files}")
    if streaming:
        r = spark.readStream
        if max_files is not None:
            r = r.option("maxFilesPerTrigger", max_files)
        return r
    if max_files is not None:
        # batch reads have no per-trigger bound — refusing beats the
        # caller believing ingestion is bounded while the whole path is
        # scanned (r13 review)
        raise ValueError("max_files only applies to streaming reads")
    return spark.read


def read_blocks(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    max_files: int | None = None,
    evolve: bool = False,
) -> DataFrame:
    """`*block.json` files -> bronze blocks (one row per block).

    ``evolve=True`` turns on field-addition propagation (Autoloader's
    `schemaEvolutionMode addNewColumns` / the warehouse writer's
    `allowFieldAddition`): the declared schema widens by the probed
    on-disk schema before the read, so new JSON fields land as columns
    instead of being dropped (streaming/evolution.py; T8)."""
    if evolve:
        from near_public_lakehouse_spark.streaming.evolution import read_json_evolving

        configure_runtime(spark)
        return read_json_evolving(
            spark, path, BLOCK_SCHEMA, glob="*block.json",
            streaming=streaming, max_files=max_files,
        )
    return (
        _reader(spark, streaming, max_files)
        .format("json")
        .schema(BLOCK_SCHEMA)
        .option("pathGlobFilter", "*block.json")
        .load(path)
    )


def read_shards(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    max_files: int | None = None,
    evolve: bool = False,
) -> DataFrame:
    """`*shard*.json` files -> bronze chunks/shards (one row per shard).
    ``evolve=True``: see `read_blocks` — same T8 field-addition path."""
    if evolve:
        from near_public_lakehouse_spark.streaming.evolution import read_json_evolving

        configure_runtime(spark)
        return read_json_evolving(
            spark, path, SHARD_SCHEMA, glob="*shard*.json",
            streaming=streaming, max_files=max_files,
        )
    return (
        _reader(spark, streaming, max_files)
        .format("json")
        .schema(SHARD_SCHEMA)
        .option("pathGlobFilter", "*shard*.json")
        .load(path)
    )
