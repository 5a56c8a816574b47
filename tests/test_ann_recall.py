"""ANN operator recall in its design regime: planted near-duplicates
(cosine ~0.999) must be retrieved as the top match by the LSH index, and
the IVF index must agree with brute force on its probed cell (already
oracle-pinned; here we pin cross-operator recall)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.similarity import N_QUERY_VECS, lsh_topk_frame

DIM = 64


def _vec(seed: int) -> list[float]:
    """Deterministic pseudo-random unit-scale vector."""
    out = []
    for d in range(DIM):
        h = hashlib.md5(f"v{seed}_d{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 2**32) * 2.0 - 1.0)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    """200 background vectors + for each query id q in [0,5): vec_id q is a
    slightly-perturbed copy of vec_id 1000+q (its planted twin)."""
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


def test_lsh_finds_planted_near_duplicates(spark, planted):
    top = lsh_topk_frame(planted).collect()
    best = {}
    for r in top:
        if r.rnk == 1:
            best[r.qid] = (r.cid, r.cosine)
    # every query's top hit is its planted twin, at near-1 cosine
    assert set(best) == set(range(N_QUERY_VECS))
    for q, (cid, cos) in best.items():
        assert cid == 1000 + q, best
        assert cos > 0.99


def test_lsh_probe_sets_bound_candidate_work(spark, planted):
    """Multi-probe touches <= 9/2^8 of bucket space per query: the output
    candidate pool must stay far below brute force (200+ per query)."""
    out = lsh_topk_frame(planted)
    # rnk column exists and respects TOP_K
    assert out.groupBy("qid").count().agg(F.max("count")).collect()[0][0] <= 5


@pytest.fixture(scope="module")
def clustered(spark):
    """IVF's design regime: 10 tight clusters of 30 vectors each around
    well-separated centroids; the first N_QUERY_VECS vec_ids are extra
    members of clusters 0..4, so their true top-5 neighbors live in their
    own cell."""
    rows = []
    for lab in range(10):
        centroid = _vec(7000 + lab)
        for i in range(30):
            jitter = _vec(lab * 100 + i)
            member = [c + 0.05 * j for c, j in zip(centroid, jitter)]
            rows.append((100 + lab * 30 + i, member, lab))
    for q in range(N_QUERY_VECS):
        centroid = _vec(7000 + q)
        jitter = _vec(6000 + q)
        rows.append((q, [c + 0.05 * j for c, j in zip(centroid, jitter)], q))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_ivf_multiprobe_recall_sweep(spark, clustered):
    """Multi-probe IVF recall contract (round-2 verdict item #5):
    recall@5 vs brute force must be monotone non-decreasing in nprobe,
    exhaustive (=1.0) at nprobe = n_cells, and >= 0.95 at nprobe=2 in the
    clustered regime the quantizer is built for.

    Context for the sweep on UNclustered data (sf0.001 uniform synthetic
    embeddings, labels carry no geometry): recall@5 was measured at
    nprobe 1/2/4/8/10 -> 0.08/0.16/0.32/0.80/1.00 — exactly the
    nprobe/n_cells sampling floor, the expected IVF degradation when the
    coarse quantizer captures no structure. On clustered data the curve
    saturates immediately, which is what this test pins."""
    from near_public_lakehouse_spark.queries.similarity import (
        embedding_topk_frame,
        ivf_topk_frame,
    )

    truth = {
        (r.qid, r.cid) for r in embedding_topk_frame(clustered).collect()
    }
    recalls = {}
    for nprobe in (1, 2, 10):
        got = {(r.qid, r.cid) for r in ivf_topk_frame(clustered, nprobe=nprobe).collect()}
        recalls[nprobe] = len(got & truth) / len(truth)
    assert recalls[1] <= recalls[2] <= recalls[10], recalls
    assert recalls[10] == 1.0, recalls  # probing every cell == brute force
    assert recalls[2] >= 0.95, recalls  # stated nprobe target (design regime)


def test_pq_recall_on_clustered(spark, clustered):
    """PQ + ADC + exact rerank recall contract vs brute force: the
    candidate budget (PQ_RERANK per query) plus exact rerank must recover
    nearly all of the true top-5 in the clustered design regime."""
    from near_public_lakehouse_spark.queries.similarity import (
        embedding_topk_frame,
        pq_topk_frame,
    )

    truth = {(r.qid, r.cid) for r in embedding_topk_frame(clustered).collect()}
    got = {(r.qid, r.cid) for r in pq_topk_frame(clustered).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_pq_finds_planted_near_duplicates(spark, planted):
    """A planted twin at cosine ~0.999 survives quantization: it must be
    each query's rank-1 hit after the exact rerank."""
    from near_public_lakehouse_spark.queries.similarity import pq_topk_frame

    best = {r.qid: (r.cid, r.cosine) for r in pq_topk_frame(planted).collect() if r.rnk == 1}
    assert set(best) == set(range(N_QUERY_VECS))
    for q, (cid, cos) in best.items():
        assert cid == 1000 + q, best
        assert cos > 0.99


def test_lsh_range_search_subset_and_recall(spark, planted):
    """range_search_lsh emits only true range hits (subset of the exact
    radius query) and recovers every planted twin at the 0.9 floor."""
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries.similarity import (
        embedding_topk_frame,
        lsh_scored_pairs,
    )

    floor = 0.9
    lsh_hits = {
        (r.qid, r.cid)
        for r in lsh_scored_pairs(planted).filter(F.col("cosine") >= floor).collect()
    }
    # exact range truth from the brute-force scorer (top-k frame windowed
    # at 5 is enough here: each query has exactly one >=0.9 neighbor)
    exact = {
        (r.qid, r.cid)
        for r in embedding_topk_frame(planted).filter(F.col("cosine") >= floor).collect()
    }
    assert lsh_hits <= exact or not exact  # no false positives vs truth set
    # every planted twin recovered
    for q in range(N_QUERY_VECS):
        assert (q, 1000 + q) in lsh_hits


def test_pq_codebook_training_matches_duckdb_cte_exactly(spark):
    """THE r13 review pin (finding #1): the integer-lattice codebook that
    `train_pq_codebooks` computes in numpy must equal, ENTRY BY ENTRY,
    the codebook the oracle's unrolled training CTEs derive in DuckDB on
    the same data. This is stronger than the end-to-end hash gate — the
    review showed 503/1024 entries diverging (DuckDB `//` truncates
    toward zero, numpy floors) while the final top-K still coincided at
    sf0.01, so only a codebook-level pin makes the divergence visible."""
    import duckdb

    from near_public_lakehouse_spark.queries.similarity import (
        _PQ_SUB,
        _pq_training_sql,
        PQ_K,
        PQ_M,
        PQ_QUANT,
        PQ_TRAIN_CAP,
        PQ_TRAIN_ITERS,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, embedding "
        "FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    sql = f"""
WITH eexp AS (
  SELECT vec_id,
         CAST((d0 - 1) // {_PQ_SUB} AS INT) AS m,
         CAST((d0 - 1) % {_PQ_SUB} AS INT) AS d,
         CAST(floor(CAST(v AS DOUBLE) * {PQ_QUANT} + 0.5) AS BIGINT) AS xq
  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS d0,
               unnest(embedding) AS v
        FROM embeddings)
),
samp AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_TRAIN_CAP}),
sexp AS (SELECT e.* FROM eexp e JOIN samp USING (vec_id)),
init AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id FROM samp ORDER BY vec_id LIMIT {PQ_K})
),
cb0 AS (
  SELECT s.m, i.cid, s.d, s.xq AS cq
  FROM init i JOIN sexp s ON s.vec_id = i.vec_id
),
{_pq_training_sql()}
SELECT m, cid, d, cq FROM cb{PQ_TRAIN_ITERS} ORDER BY m, cid, d
"""
    duck = {(m, c, d): q for m, c, d, q in con.execute(sql).fetchall()}
    books = None  # assigned below from the PRODUCTION trainer

    from near_public_lakehouse_spark.queries.similarity import (
        train_pq_codebooks,
    )
    from near_public_lakehouse_spark.sources.tables import load_table

    books = train_pq_codebooks(
        load_table(spark, "/root/testdata/sf0.01", "embeddings")
    )

    assert len(duck) == PQ_M * PQ_K * _PQ_SUB
    diffs = [
        (m, c, d, int(books[m, c, d]), int(duck[(m, c, d)]))
        for m in range(PQ_M)
        for c in range(PQ_K)
        for d in range(_PQ_SUB)
        if int(books[m, c, d]) != int(duck[(m, c, d)])
    ]
    assert not diffs, f"{len(diffs)} codebook entries diverge, e.g. {diffs[:5]}"
    # negative means actually occur on this corpus, so the floor-vs-trunc
    # divergence the pin exists for is genuinely exercised
    assert (books < 0).any()

