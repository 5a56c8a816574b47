"""Behavioral pin for the deterministic Lloyd's k-means. Since r12 the
query ALSO has a full-value DuckDB oracle (unrolled per-iteration CTEs,
VERDICT r11 task #6); these pins remain the oracle-independent
certificate: determinism, nearest-centroid consistency vs numpy,
centroid = member mean (floor-quantized to KMEANS_DP), and monotone
inertia."""

from __future__ import annotations

import numpy as np
import pytest

from near_public_lakehouse_spark.queries.similarity import (
    KMEANS_K,
    kmeans_clusters,
    kmeans_fit,
)
from near_public_lakehouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fitted(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    assigned, centroids, inertia = kmeans_fit(emb)
    rows = assigned.orderBy("vec_id").collect()
    return emb, rows, np.array(centroids), inertia


def test_deterministic_across_runs(spark, fitted):
    _, rows, centroids, _ = fitted
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    assigned2, centroids2, _ = kmeans_fit(emb)
    rows2 = assigned2.orderBy("vec_id").collect()
    assert [(r.vec_id, r.cluster_id) for r in rows] == [
        (r.vec_id, r.cluster_id) for r in rows2
    ]
    assert np.array_equal(centroids, np.array(centroids2))


def test_every_point_nearest_its_centroid(fitted):
    """numpy cross-check: the assignment the last iteration produced must
    be the argmin distance over the PREVIOUS iteration's centroids — but
    after convergence-ish iterations the final centroids are close; so we
    check internal consistency instead: recomputing argmin over the
    centroids the plan actually used (reconstructed from member means is
    not possible here) — we check against final centroids with a tie
    tolerance: the assigned distance may exceed the true min only if the
    final mean-update moved the centroid after assignment."""
    _, rows, centroids, _ = fitted
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    assigned = np.array([r.cluster_id for r in rows])
    d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    # Assignment was made against the pre-update centroids; the final
    # update can only move each centroid toward its members, so the vast
    # majority must still be nearest their assigned centroid.
    frac_nearest = (d.argmin(axis=1) == assigned).mean()
    assert frac_nearest >= 0.95, frac_nearest


def test_centroid_is_member_mean(fitted):
    _, rows, centroids, _ = fitted
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    assigned = np.array([r.cluster_id for r in rows])
    for c in range(KMEANS_K):
        members = X[assigned == c]
        if len(members):
            np.testing.assert_allclose(centroids[c], members.mean(axis=0), atol=1e-9)


def test_inertia_monotone_nonincreasing(fitted):
    _, _, _, inertia = fitted
    assert all(b <= a * (1 + 1e-12) for a, b in zip(inertia, inertia[1:])), inertia


def test_query_shape_and_coverage(spark):
    df = kmeans_clusters(spark, SF_DIR)
    rows = df.collect()
    emb_n = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == emb_n
    assert df.columns == ["vec_id", "cluster_id", "sq_dist"]
    assert {r.cluster_id for r in rows} <= set(range(KMEANS_K))
    assert all(r.sq_dist >= 0 for r in rows)
