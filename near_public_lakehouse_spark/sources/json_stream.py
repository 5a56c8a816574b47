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


def _read_json(
    spark: SparkSession,
    path: str,
    schema,
    glob: str,
    streaming: bool,
    max_files: int | None,
    evolve: bool,
) -> DataFrame:
    """The one shared source body (r14 review: read_blocks/read_shards
    were full copies, and the r13 max_files validation had already landed
    on only ONE of the two code paths). Validation runs BEFORE the
    evolve branch so both paths reject max_files < 1 and batch+max_files
    identically."""
    configure_runtime(spark)
    if max_files is not None and max_files < 1:
        raise ValueError(f"max_files must be >= 1, got {max_files}")
    if max_files is not None and not streaming:
        # batch reads have no per-trigger bound — refusing beats the
        # caller believing ingestion is bounded while the whole path is
        # scanned (r13 review)
        raise ValueError("max_files only applies to streaming reads")
    if evolve:
        from near_public_lakehouse_spark.streaming.evolution import read_json_evolving

        return read_json_evolving(
            spark, path, schema, glob=glob,
            streaming=streaming, max_files=max_files,
        )
    r = spark.readStream if streaming else spark.read
    if streaming and max_files is not None:
        r = r.option("maxFilesPerTrigger", max_files)
    return (
        r.format("json").schema(schema).option("pathGlobFilter", glob).load(path)
    )


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
    return _read_json(
        spark, path, BLOCK_SCHEMA, "*block.json", streaming, max_files, evolve
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
    return _read_json(
        spark, path, SHARD_SCHEMA, "*shard*.json", streaming, max_files, evolve
    )
