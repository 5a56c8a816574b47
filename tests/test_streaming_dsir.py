"""Streaming DSIR importance (`streaming_dsir_importance`): a
single-batch run must reproduce the batch query exactly; multi-batch
runs must score each doc under the models-seen-so-far with immutable
arrival-time scores; the bucket state stays bounded by the feature
space."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.queries.curation import DSIR_BUCKETS
from near_public_lakehouse_spark.streaming.jobs import (
    dsir_scores_from_state,
    streaming_dsir_importance,
)

from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_single_batch_stream_equals_batch_scores(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_dsir_importance(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)

    got = {
        r.doc_id: (r.n_feats, r.log_importance)
        for r in dsir_scores_from_state(spark, idx).collect()
    }
    want = {
        r.doc_id: (r.n_feats, r.log_importance)
        for r in all_queries()["sampling_dsir_importance"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d, (nf, li) in want.items():
        assert got[d][0] == nf, d
        assert abs(got[d][1] - li) <= 1e-9, d


def test_scores_fixed_at_arrival_and_models_accumulate(spark, tmp_path):
    """Trigger 2 must score under the merged bucket models, and trigger
    1's recorded scores must not change."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    chunk1 = [(i, "alpha beta gamma delta", "en", "s", 22) for i in range(4)]
    chunk2 = [(10 + i, "alpha beta epsilon zeta", "fr", "s", 23) for i in range(4)]

    spark.createDataFrame(chunk1, DOC_SCHEMA).write.parquet(src)
    streaming_dsir_importance(spark, src, idx, ckpt).awaitTermination(60)
    first = {
        r.doc_id: r.log_importance for r in dsir_scores_from_state(spark, idx).collect()
    }
    assert set(first) == set(range(4))

    spark.createDataFrame(chunk2, DOC_SCHEMA).write.mode("append").parquet(src)
    streaming_dsir_importance(spark, src, idx, ckpt).awaitTermination(60)
    after = {
        r.doc_id: r.log_importance for r in dsir_scores_from_state(spark, idx).collect()
    }
    for d, v in first.items():  # arrival-time scores are immutable
        assert after[d] == v
    assert set(after) == set(range(4)) | set(range(10, 14))
    # trigger 2 scored under BOTH chunks' counts: recompute its docs'
    # scores with the batch functions over the full corpus
    from near_public_lakehouse_spark.queries.curation import (
        dsir_bucket_models,
        dsir_doc_scores,
        dsir_feature_stream,
        dsir_log_ratios,
    )

    docs = spark.read.parquet(src)
    bg = dsir_feature_stream(docs)
    raw, tgt, tots = dsir_bucket_models(bg)
    want = {
        r.doc_id: r.log_importance
        for r in dsir_doc_scores(
            bg.filter(F.col("doc_id") >= 10), dsir_log_ratios(raw, tgt, tots)
        ).collect()
    }
    for d, v in want.items():
        assert abs(after[d] - v) <= 1e-9, d


def test_bucket_state_is_feature_space_bounded(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_dsir_importance(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    per_batch = (
        spark.read.option("basePath", f"{idx}/buckets")
        .parquet(f"{idx}/buckets/batch_id=*")
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_batch and all(r.n <= DSIR_BUCKETS for r in per_batch)
