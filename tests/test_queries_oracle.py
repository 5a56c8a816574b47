"""Conformance: every registered query with an oracle must match DuckDB on
sf0.001 — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.testing.compare import compare_with_oracle

from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, oracle, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    problems = compare_with_oracle(df, oracle, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_distinct_within_error_bound(spark):
    """The HLL sketch twin must track the exact count within ~3x rsd."""
    from near_public_lakehouse_spark.queries.events import (
        daily_active_users,
        sketch_dau_hll,
    )

    exact = {r.event_date: r.active_users for r in daily_active_users(spark, SF_DIR).collect()}
    approx = {
        r.event_date: r.approx_active_users
        for r in sketch_dau_hll(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(2, 0.03 * n), (d, n, approx[d])
