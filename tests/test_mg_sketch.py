"""Misra-Gries heavy-hitter candidates (`mg_candidates`): the bounded-state
guarantee — no item at or above the support threshold is ever pruned as
long as threshold > N/capacity — plus end-to-end exactness of the
candidates + exact-recount scheme against a plain groupBy."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.text import mg_candidates


def _wins(spark, grams, n_partitions=4):
    return spark.createDataFrame(
        [(g,) for g in grams], "ngram string"
    ).repartition(n_partitions)


def test_hot_items_survive_overflow_and_output_is_bounded(spark):
    rnd = random.Random(3)
    # 20k singletons force thousands of overflow decrements at capacity 64;
    # two hot grams each appear 500 times (far above N/64 ~= 328)
    grams = [f"u{i}" for i in range(20_000)] + ["hot one"] * 500 + ["hot two"] * 500
    rnd.shuffle(grams)
    cands = {r.ngram for r in mg_candidates(_wins(spark, grams), 64).collect()}
    assert "hot one" in cands and "hot two" in cands
    assert len(cands) <= 4 * 64


def test_no_overflow_keeps_every_distinct_item(spark):
    grams = [f"g{i % 50}" for i in range(1000)]
    cands = mg_candidates(_wins(spark, grams), 8192).distinct()
    assert cands.count() == 50


def test_candidates_plus_recount_equals_plain_groupby(spark):
    rnd = random.Random(11)
    # zipf-ish stream: a few heavy phrases over a sea of rare ones
    vocab = [f"p{i}" for i in range(5_000)]
    grams = [vocab[min(int(rnd.expovariate(1.0) * 100), 4_999)] for _ in range(30_000)]
    wins = _wins(spark, grams).localCheckpoint()
    n = wins.count()
    capacity = 256
    threshold = n // capacity + 1  # the guarantee boundary
    exact = {
        (r.ngram, r.c)
        for r in wins.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= threshold)
        .collect()
    }
    cands = mg_candidates(wins, capacity).distinct()
    sketched = {
        (r.ngram, r.c)
        for r in wins.join(F.broadcast(cands), "ngram")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= threshold)
        .collect()
    }
    assert sketched == exact and len(exact) > 0
