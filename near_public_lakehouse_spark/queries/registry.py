"""Query registry: every implemented operator from SURVEY.md §2 surfaces
here as a (PySpark builder, DuckDB oracle SQL) pair.

The driver contract (`__spark_entry__.py`) runs the Spark side and the
oracle side on the same parquet tables and hash-compares results, so:
- every computed column is explicitly aliased identically on both sides;
- float aggregates use the exact-decimal-then-double rule (functions.numeric)
  so results are order/parallelism independent;
- every query ends with a deterministic ORDER BY (driver sorts anyway, but
  top-k queries need it for semantics).

Queries with ``oracle=None`` are non-SQL-expressible (LSH banding, streaming
state); the driver records a rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = False, tags: tuple[str, ...] = ()):
    """Register a (spark, sf_dir) -> DataFrame query with its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip(), bench, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.
    from near_public_lakehouse_spark.queries import (  # noqa: F401
        classic,
        core,
        corpus_stats,
        dedup,
        events,
        joins_extra,
        sampling,
        scalar,
        similarity,
        stats,
        subqueries,
        text,
        windows,
    )

    return dict(REGISTRY)
