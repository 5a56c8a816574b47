"""Focused pins for the r15 third-pass optimizations (operator-internal
changes, per the optimization-round rule: every internals change gets a
test).

1. Both CC engines' measured broadcast-regime binding is OUTPUT-invariant:
   labels are bit-identical with the broadcast threshold at the default
   and at -1 (the merge/SMJ regime) — the regime pick may only move the
   physical plan, never a label.
2. `distributed_dense_rank(return_total=True)`'s free convergence scalar
   equals the countDistinct aggregate it replaced, and the ranks
   themselves are unchanged.
3. `inline_rows_df` (the Python-worker-free literal frame) round-trips
   rows and schema exactly like createDataFrame, in one partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _labels(df) -> dict:
    return {r.id: r.lab for r in df.collect()}


@pytest.fixture(scope="module")
def edge_frame(spark):
    # two components (a chain that needs doubling, plus a pair) and a
    # self-loop-free dense triangle
    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)]
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def _with_threshold(spark, value: str):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", value)
    return old


def test_min_label_cc_regime_invariant(spark, edge_frame):
    from near_public_lakehouse_spark.queries.dedup import _min_label_cc

    bcast = _labels(_min_label_cc(edge_frame))
    old = _with_threshold(spark, "-1")
    try:
        merge = _labels(_min_label_cc(edge_frame))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert bcast == merge
    assert bcast[5] == 1 and bcast[11] == 10 and bcast[22] == 20


@pytest.mark.parametrize("include_roots", [True, False])
def test_star_cc_regime_invariant(spark, edge_frame, include_roots):
    from near_public_lakehouse_spark.queries.dedup import _star_cc

    bcast = _labels(_star_cc(edge_frame, include_roots=include_roots))
    old = _with_threshold(spark, "-1")
    try:
        merge = _labels(_star_cc(edge_frame, include_roots=include_roots))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert bcast == merge
    # child rows must always carry the component minimum
    assert bcast[5] == 1 and bcast[22] == 20


def test_dense_rank_free_total_matches_count_distinct(spark):
    from near_public_lakehouse_spark.queries.suffix import (
        distributed_dense_rank,
        distributed_dense_rank_with_total,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["b", "a", "b", "c", "a", "a", "d"])],
        "gpos bigint, token string",
    )
    ranked, total = distributed_dense_rank_with_total(df, ["token"], parts=3)
    assert total == df.select("token").distinct().count() == 4
    got = {r.gpos: r.rank for r in ranked.collect()}
    # dense global ranks in key order: a=1, b=2, c=3, d=4
    expect = {0: 2, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1, 6: 4}
    assert got == expect
    # plain (non-total) call is unchanged
    got2 = {r.gpos: r.rank for r in distributed_dense_rank(df, ["token"]).collect()}
    assert got2 == expect


def test_inline_rows_df_roundtrip(spark):
    from near_public_lakehouse_spark.functions.frames import inline_rows_df

    rows = [("small", 0, 15), ("medium", 15, 30), ("large", 30, 51)]
    schema = [("tier_name", "string"), ("lo", "int"), ("hi", "int")]
    df = inline_rows_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, "tier_name string, lo int, hi int")
    # literals come out non-nullable (strictly more precise than the
    # pickled path); names and types must match exactly
    assert [(f.name, f.dataType) for f in df.schema] == [
        (f.name, f.dataType) for f in ref.schema
    ]
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))
    assert df.rdd.getNumPartitions() == 1
    # no Python-RDD provenance in the plan (the whole point)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "applySchemaToPythonRDD" not in plan
    with pytest.raises(ValueError):
        inline_rows_df(spark, [], schema)
