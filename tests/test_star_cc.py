"""Large-star/small-star connected components (`_star_cc`): the
dense-graph engine must agree exactly with min-label pointer doubling
(`_min_label_cc`) on every graph shape, including the adversarial ones —
long chains (where plain propagation historically broke), dense cliques
(where min-label's per-round IO stays O(edges) but star contraction
collapses to O(nodes)), and random multi-component graphs."""

from __future__ import annotations

import random

import pytest

from near_public_lakehouse_spark.queries.dedup import _min_label_cc, _star_cc


def _labels(engine, spark, edges_py):
    df = spark.createDataFrame(edges_py, "doc_a long, doc_b long")
    return {(r.id, r.lab) for r in engine(df).collect()}


def _both(spark, edges_py):
    a = _labels(_star_cc, spark, edges_py)
    b = _labels(_min_label_cc, spark, edges_py)
    assert a == b, f"star vs min-label disagree: {sorted(a ^ b)[:6]}"
    return a


def test_long_chain(spark):
    # 121-node path: the shape that silently mislabels any bounded-round
    # plain propagation. Both engines must collapse it to one component
    # labeled by node 0.
    labs = _both(spark, [(i, i + 1) for i in range(120)])
    assert {lab for _, lab in labs} == {0}
    assert len(labs) == 121


def test_dense_clique_plus_isolated_pair(spark):
    edges = [(i, j) for i in range(25) for j in range(i + 1, 25)]
    edges += [(100, 101)]
    labs = _both(spark, edges)
    assert {lab for _, lab in labs} == {0, 100}


def test_two_chains_merged_by_bridge(spark):
    # Two long chains joined at their far ends — min label must cross the
    # bridge and flood both chains.
    left = [(i, i + 1) for i in range(0, 40)]
    right = [(i, i + 1) for i in range(100, 140)]
    labs = _both(spark, left + right + [(40, 140)])
    assert {lab for _, lab in labs} == {0}


def test_duplicate_and_reversed_edges(spark):
    # The edge multiset from LSH verification can contain dupes and both
    # orientations; neither engine may care.
    edges = [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4), (4, 5)]
    labs = _both(spark, edges)
    assert labs == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


@pytest.mark.parametrize("seed,n,m", [(7, 80, 60), (11, 80, 120), (13, 50, 300)])
def test_random_graphs_agree(spark, seed, n, m):
    rnd = random.Random(seed)
    edges = [
        (a, b)
        for a, b in ((rnd.randrange(n), rnd.randrange(n)) for _ in range(m))
        if a != b
    ]
    labs = _both(spark, edges)
    # every label is a component member and the minimum of its component
    by_lab: dict[int, set[int]] = {}
    for node, lab in labs:
        by_lab.setdefault(lab, set()).add(node)
    for lab, members in by_lab.items():
        assert lab == min(members)


def test_star_query_matches_pointer_doubling_on_testdata(spark):
    from near_public_lakehouse_spark.queries.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in dedup_clusters(spark, sf).collect()]
    b = [tuple(r) for r in dedup_clusters_star(spark, sf).collect()]
    assert a == b and len(a) > 0


def test_empty_edge_set_terminates_fast_with_empty_labels(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert _star_cc(empty).count() == 0
    assert _min_label_cc(empty).count() == 0
