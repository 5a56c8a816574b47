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


def test_cc_long_chain_converges_within_round_cap(spark):
    """A 120-edge path (diameter >> round cap) must still fully converge:
    pointer doubling makes rounds O(log diameter), so the cap of 50 holds
    for any realistic component. Plain one-hop propagation fails this."""
    from near_public_lakehouse_spark.queries.dedup import _min_label_cc

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    labels = _min_label_cc(edges)
    assert labels.filter("lab != 0").count() == 0
    assert labels.count() == 121


def test_cc_multiple_components(spark):
    from near_public_lakehouse_spark.queries.dedup import _min_label_cc

    edges = spark.createDataFrame(
        # component {1,2,3}, component {10,11}, chain {20..24}
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "doc_a long, doc_b long",
    )
    labels = {r.id: r.lab for r in _min_label_cc(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                      20: 20, 21: 20, 22: 20, 23: 20, 24: 20}
