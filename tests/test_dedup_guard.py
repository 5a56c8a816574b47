"""Oversized-block guard on the exact blocked-Jaccard self-join: a hot
(source, len_bucket) key must be excluded from the pair product instead of
going quadratic."""

from __future__ import annotations

from near_public_lakehouse_spark.queries.dedup import _jaccard_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_chars int, text string")


def test_oversized_block_is_excluded(spark):
    rows = [
        # hot block: 3 identical docs in (web, bucket 0) — all pairwise dups
        (1, "web", 10, "alpha beta gamma"),
        (2, "web", 10, "alpha beta gamma"),
        (3, "web", 10, "alpha beta gamma"),
        # small block: 2 identical docs in (books, bucket 0)
        (4, "books", 10, "delta epsilon zeta"),
        (5, "books", 10, "delta epsilon zeta"),
    ]
    pairs = _jaccard_pairs(_docs(spark, rows), max_block=2).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(4, 5)}


def test_guard_keeps_everything_under_cap(spark):
    rows = [
        (1, "web", 10, "alpha beta gamma"),
        (2, "web", 10, "alpha beta gamma"),
        (3, "web", 10, "alpha beta gamma"),
    ]
    pairs = _jaccard_pairs(_docs(spark, rows), max_block=3).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(1, 2), (1, 3), (2, 3)}


def test_dropped_blocks_metric_is_observable(spark):
    """VERDICT r3 #4: truncation must be visible — the guard reports how
    many blocks (and docs) it excluded, in the same pass as the join."""
    from pyspark.sql import Observation

    rows = [
        # hot block: 3 docs in (web, bucket 0) -> dropped under max_block=2
        (1, "web", 10, "alpha beta gamma"),
        (2, "web", 10, "alpha beta gamma"),
        (3, "web", 10, "alpha beta gamma"),
        # surviving block
        (4, "books", 10, "delta epsilon zeta"),
        (5, "books", 10, "delta epsilon zeta"),
    ]
    obs = Observation("jaccard_guard")
    pairs = _jaccard_pairs(_docs(spark, rows), max_block=2, observation=obs)
    assert {(p.doc_a, p.doc_b) for p in pairs.collect()} == {(4, 5)}
    metrics = obs.get
    assert metrics["dropped_blocks"] == 1
    assert metrics["dropped_docs"] == 3


def test_dropped_blocks_metric_zero_when_nothing_dropped(spark):
    from pyspark.sql import Observation

    rows = [
        (1, "web", 10, "alpha beta gamma"),
        (2, "web", 10, "alpha beta gamma"),
    ]
    obs = Observation("jaccard_guard_zero")
    pairs = _jaccard_pairs(_docs(spark, rows), max_block=2, observation=obs)
    pairs.collect()
    assert obs.get["dropped_blocks"] == 0
    assert obs.get["dropped_docs"] == 0
