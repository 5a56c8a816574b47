"""Streaming CDC chunk indexer (`streaming_cdc_chunks`): a single-batch
run must equal the batch cdc_chunk_dedup; multi-batch folds must
accumulate cross-batch duplicate families; replay is idempotent."""

from __future__ import annotations

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    cdc_families_from_state,
    streaming_cdc_chunks,
)

from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_single_batch_stream_equals_batch_families(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_cdc_chunks(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    got = {
        r.chunk_hash: (r.chunk_len, r.n_occurrences, r.n_docs, r.example_doc_id)
        for r in cdc_families_from_state(spark, idx).collect()
    }
    want = {
        r.chunk_hash: (r.chunk_len, r.n_occurrences, r.n_docs, r.example_doc_id)
        for r in all_queries()["cdc_chunk_dedup"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_cross_batch_duplicates_surface_in_the_fold(spark, tmp_path):
    """A chunk seen once per trigger is invisible per-batch but becomes a
    family in the fold — the reason the index stores singletons too."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    text = "p1 p2 p3 p4 p5 p6 p7 p8 p9"
    spark.createDataFrame([(1, text, "en", "s", len(text))], DOC_SCHEMA).write.parquet(src)
    streaming_cdc_chunks(spark, src, idx, ckpt).awaitTermination(60)
    assert cdc_families_from_state(spark, idx).count() == 0  # no dup yet

    spark.createDataFrame(
        [(2, text, "en", "s", len(text))], DOC_SCHEMA
    ).write.mode("append").parquet(src)
    streaming_cdc_chunks(spark, src, idx, ckpt).awaitTermination(60)
    fams = cdc_families_from_state(spark, idx).collect()
    assert fams and all(r.n_docs == 2 and r.example_doc_id == 1 for r in fams)
