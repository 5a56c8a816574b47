"""Local conformance harness: run a registered query in PySpark and its
oracle SQL in DuckDB on the same parquet tables, canonicalize, compare.

This mirrors the driver's t2 gate (row-count + column names + sorted
value comparison) so oracle drift is caught in `pytest` before a round
ends, not by the judge.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from typing import Any

import duckdb

from near_public_lakehouse_spark.sources.tables import TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's pre-registered table views."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _values_close(a: Any, b: Any) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
        except (TypeError, ValueError):
            return False
    return a == b


def compare_with_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == match."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(_norm(v) for v in row) for row in spark_df.collect()]

    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        problems.append(f"column mismatch: spark={spark_cols} oracle={oracle_cols}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
        return problems

    # Reorder oracle columns to spark's order, then compare order-insensitively.
    idx = [oracle_cols.index(next(o for o in oracle_cols if o.lower() == c.lower())) for c in spark_cols]
    oracle_rows = [tuple(r[i] for i in idx) for r in oracle_rows]
    s_sorted = sorted(spark_rows, key=_sort_key)
    o_sorted = sorted(oracle_rows, key=_sort_key)
    for rn, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for cn, (sv, ov) in enumerate(zip(sr, orow)):
            if not _values_close(sv, ov):
                problems.append(
                    f"row {rn} col {spark_cols[cn]}: spark={sv!r} oracle={ov!r}"
                )
                if len(problems) >= 10:
                    return problems
    return problems
