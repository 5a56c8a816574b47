"""Small driver-literal DataFrames without the Python-RDD tax.

`spark.createDataFrame(list_of_rows)` parallelizes through a PythonRDD:
every SCAN of the frame launches one Python worker per slice (numSlices
defaults to defaultParallelism), so a 640-row centroid table costs 32
Python-worker forks PER broadcast build — measured in the r15
optimization round as 32-task stages of ~2 s wall and ~0 CPU inside
every k-means iteration (62 s of task wall across one kmeans_clusters
run, executorCpuTime 0.45 s: the tasks were waiting on worker startup,
not computing). `inline_rows_df` builds the same rows as a JVM-side
literal `inline(array(struct(...)))` projection instead — no Python
workers, one partition, constant-folded by Catalyst.

Intended for SMALL literal tables (seeds, tier bounds, per-iteration
centroids — tens to thousands of rows); the expression tree grows with
the row count, so anything large belongs in a real distributed frame.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def inline_rows_df(
    spark: SparkSession, rows: Sequence[tuple], schema: Sequence[tuple[str, str]]
) -> DataFrame:
    """(rows, [(col_name, sql_type), ...]) -> single-partition JVM-literal
    DataFrame. `rows` must be non-empty (an empty literal array has no
    element type); callers with a legitimately-empty case should keep
    `createDataFrame`, which carries the schema explicitly."""
    if not rows:
        raise ValueError("inline_rows_df needs at least one row")
    for i, row in enumerate(rows):
        # zip() below would silently truncate a mismatched row into a
        # structurally wrong frame (r15 ADVICE); fail like createDataFrame
        if len(row) != len(schema):
            raise ValueError(
                f"inline_rows_df row {i} has {len(row)} values for "
                f"{len(schema)} schema columns"
            )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(typ).alias(name)
                for v, (name, typ) in zip(row, schema)
            ]
        )
        for row in rows
    ]
    # explicit numPartitions=1: bare range(1) mints defaultParallelism
    # partitions (31 empty tasks per scan on local[32])
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
