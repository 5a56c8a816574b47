"""Streaming retrieval index (`streaming_retrieval_index`): BM25 over the
folded incremental postings/docstats state must equal the batch
`retrieval_bm25_topk` on the corpus seen so far (VERDICT r8 task #3) —
single-batch, multi-batch (forced micro-batching), and incremental
append. The fold re-enters the batch query's own frames
(retrieval._index_from_postings/_score/_ranked), so this pins that the
sharing is real, not parallel implementations drifting."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    bm25_topk_from_state,
    streaming_retrieval_index,
)

from tests.conftest import SF_DIR
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


def _rows(df):
    return [(r.qid, r.rnk, r.doc_id, r.score) for r in df.collect()]


def _batch_topk(spark, docs):
    from near_public_lakehouse_spark.queries.retrieval import (
        TOP_K,
        _bm25_scores,
        _ranked,
    )

    return (
        _ranked(_bm25_scores(docs), TOP_K)
        .select("qid", "rnk", "doc_id", "score")
        .orderBy("qid", "rnk")
    )


def test_single_batch_stream_equals_batch_query(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_retrieval_index(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    got = _rows(bm25_topk_from_state(spark, idx))
    want = _rows(all_queries()["a9_retrieval_bm25_topk"].fn(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_multi_batch_fold_equals_batch_query(spark, tmp_path):
    """Force many micro-batches (maxFilesPerTrigger=1 over a multi-file
    corpus): per-batch partials fold to exactly the batch answer —
    postings are disjoint by doc, docstats are additive, and avgdl is
    one exact-integer division either way."""
    src = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(4).write.parquet(src)
    idx = str(tmp_path / "idx")
    streaming_retrieval_index(
        spark, src, idx, str(tmp_path / "ckpt"), max_files_per_trigger=1
    ).awaitTermination(180)
    import os

    n_batches = len(
        [d for d in os.listdir(f"{idx}/postings") if d.startswith("batch_id=")]
    )
    assert n_batches >= 3  # genuinely incremental, not one big batch
    got = _rows(bm25_topk_from_state(spark, idx))
    want = _rows(_batch_topk(spark, spark.read.parquet(src)))
    assert got == want and len(got) > 0


def test_incremental_append_tracks_corpus_so_far(spark, tmp_path):
    """Append new documents, re-drain: the fold equals the batch query
    over the GROWN corpus — document frequencies, avgdl and the derived
    query workload all move; replaying the drained stream changes
    nothing (idempotent batch_id dirs)."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    first.write.parquet(src)
    streaming_retrieval_index(spark, src, idx, ckpt).awaitTermination(120)
    assert _rows(bm25_topk_from_state(spark, idx)) == _rows(
        _batch_topk(spark, first)
    )

    second.write.mode("append").parquet(src)
    streaming_retrieval_index(spark, src, idx, ckpt).awaitTermination(120)
    got = _rows(bm25_topk_from_state(spark, idx))
    assert got == _rows(_batch_topk(spark, spark.read.parquet(src)))

    # replay: a third drain with nothing new must not change the fold
    streaming_retrieval_index(spark, src, idx, ckpt).awaitTermination(120)
    assert _rows(bm25_topk_from_state(spark, idx)) == got
