"""SQ8 scalar quantization (`similarity.sq8_quantization_stats`): error
bounds and retrieval fidelity. Oracle conformance runs with the registry
suite; these pin what the oracle can't — the analytic error bound and
top-k agreement after the codec round-trip."""

from __future__ import annotations

import numpy as np

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.queries.similarity import SQ8_LEVELS, TOP_K

from tests.conftest import SF_DIR


def _vectors(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r.vec_id for r in rows]), np.array(
        [r.embedding for r in rows], dtype=np.float64
    )


def test_sq8_error_within_analytic_bound(spark):
    """Mid-rise dequantization error is bounded by half a step:
    |v - deq| <= (hi - lo) / (2 * levels) per dimension."""
    rows = all_queries()["sq8_quantization_stats"].fn(spark, SF_DIR).collect()
    assert len(rows) == 64
    for r in rows:
        step = (r.hi - r.lo) / SQ8_LEVELS
        assert r.max_abs_err <= step / 2 + 1e-12, r
        assert 0 <= r.mean_abs_err <= r.max_abs_err
        assert r.n_values == 500


def test_sq8_roundtrip_preserves_topk(spark):
    """Retrieval fidelity: cosine top-k computed on dequantized codes
    must agree with exact float top-k (recall@5 >= 0.9 over 20 query
    vectors on this corpus — the quantization noise is ~1e-3 of the
    value range)."""
    ids, X = _vectors(spark)
    lo, hi = X.min(axis=0), X.max(axis=0)
    rng = np.where(hi > lo, hi - lo, 1.0)
    code = np.minimum(SQ8_LEVELS - 1, np.floor((X - lo) / rng * SQ8_LEVELS))
    deq = lo + (code + 0.5) * rng / SQ8_LEVELS

    def topk(M, q):
        sims = M @ M[q] / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[q]) + 1e-12)
        sims[q] = -np.inf
        return set(np.argsort(-sims)[:TOP_K])

    hits = total = 0
    for q in range(20):
        exact, approx = topk(X, q), topk(deq, q)
        hits += len(exact & approx)
        total += TOP_K
    assert hits / total >= 0.9, hits / total
