"""Streaming winnowing indexer (`streaming_winnowing`): single-batch
equality with the batch winnowing_matches; cross-batch fingerprint
matches surface in the fold."""

from __future__ import annotations

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    streaming_winnowing,
    winnowing_matches_from_state,
)

from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_single_batch_stream_equals_batch_matches(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_winnowing(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    got = {
        r.fingerprint: (r.n_docs, r.example_doc_id)
        for r in winnowing_matches_from_state(spark, idx).collect()
    }
    want = {
        r.fingerprint: (r.n_docs, r.example_doc_id)
        for r in all_queries()["winnowing_matches"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_cross_batch_matches_surface_in_the_fold(spark, tmp_path):
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    spark.createDataFrame([(1, text, "en", "s", len(text))], DOC_SCHEMA).write.parquet(src)
    streaming_winnowing(spark, src, idx, ckpt).awaitTermination(60)
    assert winnowing_matches_from_state(spark, idx).count() == 0

    spark.createDataFrame(
        [(2, "pre fix " + text, "en", "s", len(text) + 8)], DOC_SCHEMA
    ).write.mode("append").parquet(src)
    streaming_winnowing(spark, src, idx, ckpt).awaitTermination(60)
    matches = winnowing_matches_from_state(spark, idx).collect()
    assert matches  # the shifted shared run matched across triggers
    assert all(r.n_docs == 2 and r.example_doc_id == 1 for r in matches)
