"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (daily active users — the
README.md:48-61 daily-unique-signers shape) on sf0.001.
`queries()` / `oracle_sql()` expose every registered operator query from
`near_public_lakehouse_spark.queries` (SURVEY.md §2 coverage lives there).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from near_public_lakehouse_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from near_public_lakehouse_spark.queries.events import daily_active_users

    return daily_active_users(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-expressible query."""
    return {
        name: q.oracle for name, q in sorted(all_queries().items()) if q.oracle is not None
    }
