"""Exact quantile selection (`stats.kth_smallest`): histogram-refinement
selection must equal plain sorted() on adversarial value shapes."""

from __future__ import annotations


def test_kth_smallest_matches_sorted_reference(spark):
    """Histogram-refinement selection vs plain sorted() on adversarial
    shapes: duplicates, negatives, a heavy spike, tiny ranges."""
    import random

    from near_public_lakehouse_spark.queries.stats import kth_smallest

    rng = random.Random(6)
    cases = [
        [rng.uniform(-100, 100) for _ in range(500)],
        [1.0] * 200 + [2.0] * 300,                     # massive ties
        [rng.gauss(0, 1e-9) for _ in range(300)],      # tiny range
        list(range(1000)),
    ]
    for vals in cases:
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        ref = sorted(vals)
        for k in (1, len(vals) // 3, len(vals) // 2, len(vals)):
            assert kth_smallest(df, "x", k) == float(ref[k - 1]), (k, len(vals))


def test_kth_smallest_refinement_path_bucket_edges(spark):
    """r6 ADVICE (stats.py:370): the refinement filter must use the SAME
    bucket expression as the histogram count — Python-recomputed
    [new_lo, new_hi) boundaries could mis-place values landing exactly on
    a bucket edge. This drives the histogram path (n > QSEL_COLLECT_MAX)
    with values that are integer multiples of a non-dyadic step, so many
    sit on computed bucket boundaries."""
    from near_public_lakehouse_spark.queries.stats import (
        QSEL_COLLECT_MAX,
        kth_smallest,
    )

    n = QSEL_COLLECT_MAX * 2  # forces at least one refinement round
    vals = [i * 0.1 for i in range(n)]  # 0.1 is inexact in binary
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    ref = sorted(vals)
    for k in (1, 7, n // 2, n - 1, n):
        assert kth_smallest(df, "x", k) == ref[k - 1], k
