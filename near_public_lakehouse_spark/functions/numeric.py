"""Numeric helpers: exact aggregation + u128 token math.

The reference's money rule (SURVEY.md §1.3): u128 yoctoNEAR amounts stay
STRING in silver, DECIMAL(38,0) for arithmetic, DOUBLE only at the published
edge (BQ Writer Stream.py:47-48). We extend the same rule to the analytics
queries: SUM over DOUBLE is order-dependent in IEEE float, so a distributed
sum is non-deterministic run-to-run; summing an exact DECIMAL and casting the
*result* to DOUBLE is both deterministic and oracle-stable at any
parallelism. At 100 TB (billions of addends) this is the difference between
a reproducible pipeline and one that drifts per run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _checked_dec(c: Column | str, scale: int, precision: int) -> Column:
    """Addend cast that fails LOUDLY on overflow: with the session's
    ANSI-off contract, a value past decimal(precision,scale) casts to
    NULL and F.sum would silently skip it — an "exact" total quietly
    short of the truth, and davg a mean of a subset (r14 review). A
    genuine NULL input stays NULL (SQL aggregate semantics); only
    non-NULL-input-to-NULL-cast raises, map-side, per offending row."""
    src = _col(c)
    dec = src.cast(f"decimal({precision},{scale})")
    return F.when(
        src.isNotNull() & dec.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"dsum/davg overflow: decimal({precision},{scale}) "
                      "cannot hold "),
                src.cast("string"),
            )
        ).cast(f"decimal({precision},{scale})"),
    ).otherwise(dec)


def dsum(c: Column | str, scale: int = 6, precision: int = 28) -> Column:
    """Order-independent sum: cast addends to DECIMAL, sum exactly, emit
    DOUBLE. ``scale=6`` covers the testdata's 2-dp money and 4-dp
    products; an addend the decimal can't hold raises instead of
    silently vanishing from the total (see `_checked_dec`)."""
    return F.sum(_checked_dec(c, scale, precision)).cast("double")


def davg(c: Column | str, scale: int = 6, precision: int = 28) -> Column:
    """Deterministic mean: exact decimal sum, one double division."""
    dec = _checked_dec(c, scale, precision)
    return (F.sum(dec).cast("double") / F.count(dec)).cast("double")


def yocto_to_near(c: Column | str, dp: int = 2) -> Column:
    """u128 yoctoNEAR decimal-string -> NEAR double (display edge only).

    Mirrors ``round(amount / pow(10, 24), 2)`` in
    Epochs and validators Silver Pipeline.py:401-403.
    """
    return F.round(_col(c).cast("decimal(38,0)") / F.lit(10.0) ** 24, dp)


def md5_prefix_int(c: Column, width: int = 8) -> Column:
    """First `width` hex chars of md5(c) as a BIGINT — the repo's
    cross-engine seeded-hash idiom (DuckDB twin:
    ``conv(substring(md5(x), 1, w), 16, 10)``). ONE definition (r14
    review: at least eight hand-rolled copies lived across the query
    files, each independently re-audited for width/radix agreement with
    its oracle)."""
    return F.conv(F.substring(F.md5(c), 1, width), 16, 10).cast("bigint")
