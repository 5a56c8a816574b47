"""Distributed suffix array (`queries/suffix.py`): rank permutation
validity against a sequential Python reference, and the dense-rank
helper's equivalence to a global window."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.suffix import (
    corpus_token_stream,
    distributed_dense_rank,
    suffix_ranks,
)


def test_suffix_ranks_match_sequential_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "b a n a n a"),
            (2, "a n a b a"),
            (3, "z z z"),
        ],
        "doc_id long, text string",
    )
    stream = corpus_token_stream(docs).localCheckpoint()
    got = {r.gpos: r.rank for r in suffix_ranks(stream, spark).collect()}
    # sequential reference: build the same token sequence, sort suffixes
    rows = sorted(
        ((r.gpos, r.token) for r in stream.collect()), key=lambda x: x[0]
    )
    seq = [t for _, t in rows]
    gposes = [g for g, _ in rows]
    order = sorted(range(len(seq)), key=lambda i: seq[i:])
    want = {}
    for rank0, i in enumerate(order):
        want[gposes[i]] = rank0 + 1
    assert got == want


def test_distributed_dense_rank_equals_global_window(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("gpos"), (F.col("id") % 37).alias("k")
    )
    got = {
        r.gpos: r.rank
        for r in distributed_dense_rank(df, ["k"]).collect()
    }
    want = {r.gpos: r.k + 1 for r in df.collect()}  # k is already dense 0..36
    assert got == want
