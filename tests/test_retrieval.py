"""Retrieval family (queries/retrieval.py): structural pins on top of the
oracle hash checks that test_queries_oracle.py already runs — the query
workload shape, membership properties that must hold regardless of
scores, and the LM ranker's log-probability range."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.retrieval import (
    N_QUERY_TERMS,
    RRF_POOL,
    TOP_K,
    _bm25_scores,
    _index,
    _ranked,
)
from near_public_lakehouse_spark.queries.registry import REGISTRY
from near_public_lakehouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_query_workload_shape(spark):
    """Ten two-term queries from frequency ranks 11-30, deterministic."""
    _, _, _, qterms = _index(_docs(spark))
    rows = qterms.collect()
    assert len(rows) == N_QUERY_TERMS
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r.qid, []).append(r.token)
    assert sorted(by_qid) == list(range(N_QUERY_TERMS // 2))
    assert all(len(v) == 2 for v in by_qid.values())
    # deterministic: second derivation is identical
    again = {(r.qid, r.token) for r in _index(_docs(spark))[3].collect()}
    assert {(r.qid, r.token) for r in rows} == again


def test_bm25_hits_contain_a_query_term(spark):
    docs = _docs(spark)
    _, _, _, qterms = _index(docs)
    qmap = {}
    for r in qterms.collect():
        qmap.setdefault(r.qid, set()).add(r.token)
    top = REGISTRY["retrieval_bm25_topk"].fn(spark, SF_DIR)
    toks = docs.selectExpr("doc_id", "split(text, ' ') AS toks")
    joined = top.join(toks, "doc_id").collect()
    assert len(joined) > 0
    for r in joined:
        assert qmap[r.qid] & set(r.toks), (r.qid, r.doc_id)


def test_rrf_members_come_from_a_source_list(spark):
    """Every fused doc must appear in the BM25 top pool or the cosine
    pool — RRF can only re-rank, never invent a candidate."""
    docs = _docs(spark)
    fused = REGISTRY["retrieval_hybrid_rrf"].fn(spark, SF_DIR)
    bm_pool = _ranked(_bm25_scores(docs), RRF_POOL).select("qid", "doc_id")
    # outside the BM25 pool the doc must at least match a query term
    # (necessary condition for cosine-pool membership)
    _, _, tf, qterms = _index(docs)
    term_match = (
        tf.join(qterms.select("qid", "token"), "token").select("qid", "doc_id").distinct()
    )
    stray = fused.join(
        bm_pool.unionByName(term_match).distinct(), ["qid", "doc_id"], "left_anti"
    )
    assert stray.count() == 0


def test_query_likelihood_scores_are_log_probs(spark):
    out = REGISTRY["retrieval_query_likelihood"].fn(spark, SF_DIR).collect()
    assert len(out) > 0
    assert all(r.score < 0 for r in out)  # sums of log-probabilities
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert rnks == sorted(rnks) and rnks[0] == 1 and len(rnks) <= TOP_K
