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
