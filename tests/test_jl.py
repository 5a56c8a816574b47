"""JL projection (`similarity.jl_project` / `jl_topk_frame`): planted
near-duplicate recall in the prefilter's design regime, determinism of
the md5-seeded matrix, and the distortion bound on high-cosine pairs."""

from __future__ import annotations

import hashlib

import pytest

from near_public_lakehouse_spark.queries.similarity import (
    K_JL,
    N_QUERY_VECS,
    jl_project,
    jl_signs,
    jl_topk_frame,
)

DIM = 64


def _vec(seed: int) -> list[float]:
    out = []
    for d in range(DIM):
        h = hashlib.md5(f"v{seed}_d{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 2**32) * 2.0 - 1.0)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    for q in range(N_QUERY_VECS):
        base = _vec(9000 + q)
        noisy = [x + 0.001 * ((d % 3) - 1) for d, x in enumerate(base)]
        rows.append((q, noisy, 0))
        rows.append((1000 + q, base, 0))
    for i in range(200):
        rows.append((10 + i, _vec(i), 0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_jl_matrix_is_deterministic_and_pm1():
    a, b = jl_signs(), jl_signs()
    assert a == b
    assert len(a) == K_JL and all(len(r) == DIM for r in a)
    assert {v for row in a for v in row} == {1.0, -1.0}


def test_jl_prefilter_finds_planted_near_duplicates(spark, planted):
    """cos ~0.999 twins survive 64->16 projection as the top hit — the
    regime a projected prefilter exists for."""
    best = {r.qid: r.cid for r in jl_topk_frame(planted).collect() if r.rnk == 1}
    assert best == {q: 1000 + q for q in range(N_QUERY_VECS)}


def test_jl_projection_is_partitioning_invariant(spark, planted):
    one = {r.vec_id: r.p for r in jl_project(planted.coalesce(1)).collect()}
    many = {r.vec_id: r.p for r in jl_project(planted.repartition(7)).collect()}
    assert one == many  # exact-decimal folds: bit-identical either way
