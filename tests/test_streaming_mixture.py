"""Streaming quality-mixture sampler (`streaming_quality_mixture`): a
single-batch run must reproduce the batch sampler exactly; multi-batch
runs must score each doc under the corpus-seen-so-far distribution with
replay-idempotent state; the frequency index must fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    compact_substring_index,
    mixture_kept_from_state,
    streaming_quality_mixture,
)

from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_single_batch_stream_equals_batch_sampler(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_quality_mixture(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)

    got = {
        r.doc_id: (r.band, r.avg_logprob)
        for r in mixture_kept_from_state(spark, idx).collect()
    }
    want = {
        r.doc_id: (r.band, r.avg_logprob)
        for r in all_queries()["quality_mixture_sample"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d, (band, lp) in want.items():
        assert got[d][0] == band, d
        assert abs(got[d][1] - lp) <= 1e-9, d


def test_decisions_are_fixed_at_arrival_and_state_accumulates(spark, tmp_path):
    """Trigger 2 must score under the merged (batch1+batch2) frequency
    table, and trigger 1's recorded decisions must not change."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    chunk1 = [(i, "common words common words filler", "en", "s", 30) for i in range(5)]
    chunk2 = [(10 + i, "common words rare gibberish tokens", "en", "s", 33) for i in range(5)]

    spark.createDataFrame(chunk1, DOC_SCHEMA).write.parquet(src)
    streaming_quality_mixture(spark, src, idx, ckpt).awaitTermination(60)
    first = {
        r.doc_id: (r.band, r.avg_logprob)
        for r in mixture_kept_from_state(spark, idx).collect()
    }

    spark.createDataFrame(chunk2, DOC_SCHEMA).write.mode("append").parquet(src)
    streaming_quality_mixture(spark, src, idx, ckpt).awaitTermination(60)
    after = {
        r.doc_id: (r.band, r.avg_logprob)
        for r in mixture_kept_from_state(spark, idx).collect()
    }
    for d, v in first.items():  # arrival-time decisions are immutable
        assert after[d] == v
    assert any(d >= 10 for d in after)  # new docs were decided
    # the frequency state now covers both chunks' vocabularies
    vocab = {
        r.token
        for r in spark.read.option("basePath", f"{idx}/freq")
        .parquet(f"{idx}/freq/batch_id=*")
        .collect()
    }
    assert "gibberish" in vocab and "filler" in vocab


def test_freq_index_folds_without_changing_vocab_mass(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    streaming_quality_mixture(
        spark, docs_path, idx, ckpt, max_files_per_trigger=1
    ).awaitTermination(120)
    before = (
        spark.read.parquet(f"{idx}/freq/batch_id=*")
        .agg(F.sum("cnt").alias("m"))
        .collect()[0]
        .m
    )
    compact_substring_index(
        spark, f"{idx}/freq", checkpoint=ckpt, key_col="token", count_col="cnt"
    )
    after = (
        spark.read.parquet(f"{idx}/freq/batch_id=*")
        .agg(F.sum("cnt").alias("m"))
        .collect()[0]
        .m
    )
    assert before == after
