"""Streaming decontamination twin: the availableNow file-stream run must
produce exactly the batch benchmark_decontamination result on the same
corpus (round-2 verdict item #7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.text import doc_ngrams
from near_public_lakehouse_spark.streaming.jobs import streaming_decontamination

from tests.conftest import SF_DIR


def test_streaming_matches_batch_decontamination(spark, tmp_path):
    from near_public_lakehouse_spark.queries import all_queries

    docs_path = f"{SF_DIR}/documents.parquet"
    expected = {
        (r.doc_id, r.n_ngrams, r.n_contaminated, round(r.contamination_share, 9))
        for r in all_queries()["benchmark_decontamination"].fn(spark, SF_DIR).collect()
    }

    # Static benchmark side, built once — same definition as the batch query.
    docs = spark.read.parquet(docs_path)
    bench = (
        doc_ngrams(docs)
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("ngs").alias("g"))
        .distinct()
    )

    out = str(tmp_path / "decontaminated")
    q = streaming_decontamination(
        spark, docs_path, bench, out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.n_ngrams, r.n_contaminated, round(r.contamination_share, 9))
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected


def test_streaming_decontamination_resumes_without_duplicates(spark, tmp_path):
    """Checkpoint-driven resume: a second availableNow run over the same
    source must append nothing (no reprocessing, no duplicate rows)."""
    docs_path = f"{SF_DIR}/documents.parquet"
    docs = spark.read.parquet(docs_path)
    bench = (
        doc_ngrams(docs)
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("ngs").alias("g"))
        .distinct()
    )
    out = str(tmp_path / "decontaminated")
    ckpt = str(tmp_path / "ckpt")

    q1 = streaming_decontamination(spark, docs_path, bench, out, ckpt)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    q2 = streaming_decontamination(spark, docs_path, bench, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    """The availableNow streaming run of incremental dedup must produce
    exactly the batch query's verdicts on the same incoming set."""
    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.streaming.jobs import streaming_incremental_dedup

    docs_path = f"{SF_DIR}/documents.parquet"
    expected = {
        (r.doc_id, r.verdict, r.matched_doc_id)
        for r in all_queries()["incremental_dedup"].fn(spark, SF_DIR).collect()
    }
    corpus = spark.read.parquet(docs_path).filter(F.col("doc_id") % 10 != 0)
    out = str(tmp_path / "verdicts")
    q = streaming_incremental_dedup(
        spark, docs_path, corpus, out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.verdict, r.matched_doc_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected
