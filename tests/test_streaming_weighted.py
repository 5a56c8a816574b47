"""Streaming weighted sampler (`streaming_weighted_sample`): folded
winner partials must equal the batch query over the corpus seen so far,
including winner displacement by stronger late arrivals."""

from __future__ import annotations

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    streaming_weighted_sample,
    weighted_sample_from_state,
)

from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _sample(df):
    return {(r.source, r.rnk): (r.doc_id, r.es_key) for r in df.collect()}


def test_single_batch_stream_equals_batch_sample(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_weighted_sample(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    got = _sample(weighted_sample_from_state(spark, idx))
    want = _sample(all_queries()["weighted_sample_quality"].fn(spark, SF_DIR))
    assert got == want


def test_fold_tracks_batch_query_with_displacement(spark, tmp_path):
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    # 40 docs in trigger 1, 40 more in trigger 2, one source: quota 25
    mk = lambda lo: [
        (lo + i, f"tok{lo + i} the a filler words here now", "en", "s", 30)
        for i in range(40)
    ]
    spark.createDataFrame(mk(0), DOC_SCHEMA).write.parquet(src)
    streaming_weighted_sample(spark, src, idx, ckpt).awaitTermination(60)
    first = {v[0] for v in _sample(weighted_sample_from_state(spark, idx)).values()}

    spark.createDataFrame(mk(100), DOC_SCHEMA).write.mode("append").parquet(src)
    streaming_weighted_sample(spark, src, idx, ckpt).awaitTermination(60)
    folded = _sample(weighted_sample_from_state(spark, idx))

    # equality with the batch query over the full corpus
    full = spark.read.parquet(src)
    from near_public_lakehouse_spark.queries.sampling import weighted_sample_frame

    want = _sample(weighted_sample_frame(full))
    assert folded == want
    # displacement: the fold's membership is not simply trigger-1's winners
    now = {v[0] for v in folded.values()}
    assert now != first and any(d >= 100 for d in now)
