"""Skew-tolerant joins: key salting for large x large equi-joins with hot
keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically; explicit salting is the tool for the cases AQE can't fix —
a single key holding >1 executor's worth of rows on BOTH sides, or
aggregations feeding the join. The reference's hot key is the system
account (`system` signs every validator reward receipt): at 100 TB one
account can dominate a `receipts ⋈ action_receipts` shuffle.

Mechanics: the skewed side gets a deterministic per-row salt in
[0, buckets); the other side is replicated once per bucket (explode of a
literal range — CHEAP only if that side is the smaller one). The join key
becomes (keys..., salt), spreading each hot key over `buckets` reducers.
Equality with the unsalted join is exact for inner/left joins because
every (key, salt) pair on the left meets exactly one replica of each
matching right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` (hot-keyed side) with `other` on `keys`,
    spreading each key across `buckets` shuffle partitions.

    The salt is a deterministic hash of the skewed side's full row (stable
    across retries — F.rand would re-salt on task retry and drop/duplicate
    rows). `other` is replicated `buckets` times; pick `buckets` so that
    replicated-other still fits comfortably in the shuffle.
    """
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(buckets))
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted.join(replicated, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)
