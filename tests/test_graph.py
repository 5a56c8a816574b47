"""Graph family invariants (queries/graph.py) on top of the oracle hash
checks test_queries_oracle.py runs: PageRank mass conservation and BFS
triangle-inequality/shape properties."""

from __future__ import annotations

import pytest

from near_public_lakehouse_spark.queries import all_queries

REGISTRY = all_queries()  # populates via side-effect imports

from tests.conftest import SF_DIR


def test_pagerank_mass_conserved_and_positive(spark):
    rows = REGISTRY["graph_pagerank"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    total = sum(r.pagerank for r in rows)
    # per-iteration 12dp rounding bounds drift far inside 1e-6 * N
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r.pagerank > 0 for r in rows)


def test_bfs_hops_shape(spark):
    rows = REGISTRY["graph_bfs_hops"].fn(spark, SF_DIR).collect()
    by_node = {(r.node_type, r.node_id): r.hops for r in rows}
    assert by_node[("S", 1)] == 0  # the source
    # bipartite: suppliers sit at even hop counts, customers at odd
    for (t, _), h in by_node.items():
        assert h % 2 == (0 if t == "S" else 1), (t, h)
    # frontier monotonicity: some customer at hop 1 exists
    assert any(h == 1 for (t, _), h in by_node.items() if t == "C")


def test_hits_scores_normalized_and_bipartite(spark):
    rows = REGISTRY["link_analysis_hits"].fn(spark, SF_DIR).collect()
    hubs = [r.hub_or_auth for r in rows if r.node_type == "C"]
    auths = [r.hub_or_auth for r in rows if r.node_type == "S"]
    assert hubs and auths
    # max-normalization: both vectors top out at exactly 1.0
    assert max(hubs) == 1.0 and max(auths) == 1.0
    assert all(0 < v <= 1.0 for v in hubs + auths)
