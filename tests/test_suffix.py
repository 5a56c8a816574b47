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
    # sequential reference over the SAME alphabet the engine sorts: r16
    # relabels tokens via xxhash64 when that is provably injective on the
    # corpus vocabulary (SA-neighbor outputs are invariant under any
    # injective relabeling; the oracle queries pin that), so the
    # reference sorts suffixes of the hashed sequence — fetched from
    # Spark, since xxhash64 has no Python twin here.
    rows = sorted(
        (
            (r.gpos, r.h)
            for r in stream.select(
                "gpos", F.xxhash64("token").alias("h")
            ).collect()
        ),
        key=lambda x: x[0],
    )
    seq = [t for _, t in rows]
    gposes = [g for g, _ in rows]
    order = sorted(range(len(seq)), key=lambda i: seq[i:])
    want = {}
    for rank0, i in enumerate(order):
        want[gposes[i]] = rank0 + 1
    assert got == want
    # and the permutation invariant the consumers rely on: ranks are a
    # 1..n bijection
    assert sorted(got.values()) == list(range(1, len(seq) + 1))


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


def test_longest_dup_span_exact_and_capped(spark, tmp_path):
    from near_public_lakehouse_spark.queries import all_queries

    shared10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"          # 10-token span
    shared20 = " ".join(f"c{i}" for i in range(20))        # exceeds the cap
    rows = [
        (1, f"pre1 pre2 {shared10} tail1", "en", "s", 1),
        (2, f"other {shared10} x y z", "en", "s", 1),
        (3, f"{shared20} end", "en", "s", 1),
        (4, f"lead {shared20}", "en", "s", 1),
        (5, "all unique tokens here nothing repeats ever", "en", "s", 1),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: (r.max_dup_span, r.cap_reached)
        for r in all_queries()["sa_longest_dup_span"].fn(spark, d).collect()
    }
    assert got[1] == (10, False)
    assert got[2] == (10, False)
    assert got[3] == (16, True)   # exact value >= cap reports the cap
    assert got[4] == (16, True)
    assert got[5][0] <= 1 and not got[5][1]  # stray single-token repeats at most
