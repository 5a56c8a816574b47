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
