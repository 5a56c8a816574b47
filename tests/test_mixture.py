"""Behavioral check on mixture_upsample: the integer copy counts must land
each language's post-rebalance share close to MIX_TARGET_PCT (the md5
fractional bucket covers the remainder), and no document is dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.sampling import MIX_TARGET_PCT, mixture_upsample

from tests.conftest import SF_DIR


def test_rebalanced_shares_hit_target(spark):
    plan = mixture_upsample(spark, SF_DIR).cache()
    per_lang = {
        r.lang: r.total
        for r in plan.groupBy("lang").agg(F.sum("n_copies").alias("total")).collect()
    }
    grand = sum(per_lang.values())
    for lang, pct in MIX_TARGET_PCT.items():
        share = 100.0 * per_lang[lang] / grand
        # integer floors + an imperfect md5 bucket split on a small corpus:
        # allow 3 points of slack at sf0.01 (500 docs)
        assert abs(share - pct) < 3.0, (lang, share, pct)


def test_zero_copies_only_when_downsampling(spark):
    """n_copies = 0 is the deterministic downsample of an over-represented
    stratum (factor < 1); a stratum with factor >= 1 must keep every doc."""
    plan = mixture_upsample(spark, SF_DIR).cache()
    docs_per_lang = {r.lang: r.n for r in plan.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(docs_per_lang.values())
    dropped = {
        r.lang: r.n
        for r in plan.filter(F.col("n_copies") < 1).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n_drop in dropped.items():
        factor = MIX_TARGET_PCT[lang] * total / (100 * docs_per_lang[lang])
        assert factor < 1.0, (lang, factor, n_drop)
