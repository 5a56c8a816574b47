"""Nanosecond-epoch time helpers.

The reference keeps ``block_timestamp`` as nanoseconds-since-epoch and
derives UTC timestamp + date columns from it
(Silver Lake Mainnet.sql:19-22: ``CAST(ts/1e9 AS TIMESTAMP)``, ``::date``).
We do the same arithmetic on BIGINT directly so results are identical in
every session timezone — date math via day-epoch integer + ``date_add``
never consults the JVM zone, unlike ``to_date(timestamp)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_SECOND = 1_000_000_000
NS_PER_HOUR = 3_600 * NS_PER_SECOND
NS_PER_DAY = 86_400 * NS_PER_SECOND


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _floordiv(c: Column | str, divisor: int) -> Column:
    """Exact integer floor-division. `/` on BIGINT is DOUBLE division in
    Spark SQL and a ~1.7e18 ns value exceeds double's 2^53 exact range, so
    `floor(ns/1000)` can round UP by one microsecond. Decimal division
    alone is ALSO not enough (r14 review, verified): Spark types
    decimal(38,0)/decimal(19,0) as decimal(38,6) and CheckOverflow rounds
    the quotient HALF_UP to 6 dp BEFORE floor, so any value in the last
    divisor*5e-7 ns of a unit flipped up a whole bucket (the last 43.2 ms
    of every day for ns_to_date). Subtract the modulus first: the
    numerator is then EXACTLY divisible, the 6-dp quotient is the true
    integer, and floor is a no-op. pmod keeps floor semantics for
    negative inputs."""
    a = _col(c).cast("decimal(38,0)")
    d = F.lit(divisor).cast("decimal(19,0)")
    q = (a - F.pmod(a, d)) / d
    return F.floor(q).cast("bigint")


def ns_to_seconds(c: Column | str) -> Column:
    """ns epoch -> whole seconds (BIGINT), floor semantics."""
    return _floordiv(c, NS_PER_SECOND)


def ns_to_micros(c: Column | str) -> Column:
    """ns epoch -> whole microseconds (BIGINT) — parquet/DuckDB precision."""
    return _floordiv(c, 1_000)


def ns_to_epoch_hour(c: Column | str) -> Column:
    """ns epoch -> hours since epoch (BIGINT): tz-free hourly bucketing."""
    return _floordiv(c, NS_PER_HOUR)


def ns_to_date(c: Column | str) -> Column:
    """ns epoch -> DateType via day-epoch integer (tz-independent)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), _floordiv(c, NS_PER_DAY).cast("int"))
