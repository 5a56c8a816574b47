"""Streaming per-source data card (`streaming_source_data_card`): the
state-derived card must equal the batch `source_data_card` over the corpus
seen so far (integer columns exactly, mean_quality to float noise), stay
correct across multiple triggers, survive a replayed batch, and keep its
fingerprint index compactable."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.curation import card_row_metrics
from near_public_lakehouse_spark.streaming.jobs import (
    compact_substring_index,
    data_card_from_state,
    streaming_source_data_card,
)

from tests.conftest import SF_DIR
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane

INT_COLS = (
    "n_docs",
    "total_tokens",
    "total_bpe_tokens",
    "n_exact_dup_docs",
    "n_quality_fail",
)


def _batch_card(spark, docs):
    return (
        card_row_metrics(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            (F.count(F.lit(1)) - F.countDistinct("fingerprint")).alias(
                "n_exact_dup_docs"
            ),
            F.sum("qfail").alias("n_quality_fail"),
            F.avg("q").alias("mean_quality"),
        )
    )


def _assert_cards_equal(streamed, batch):
    s = {r.source: r for r in streamed.collect()}
    b = {r.source: r for r in batch.collect()}
    assert set(s) == set(b)
    for src, row in b.items():
        for c in INT_COLS:
            assert getattr(s[src], c) == getattr(row, c), (src, c)
        assert abs(s[src].mean_quality - row.mean_quality) <= 1e-9, src


def test_stream_card_matches_batch_over_full_corpus(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    q = streaming_source_data_card(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    batch = _batch_card(spark, spark.read.parquet(docs_path))
    _assert_cards_equal(data_card_from_state(spark, idx), batch)
    # the per-trigger snapshot carries the same rows
    snap = spark.read.parquet(f"{idx}/card").drop("as_of_batch")
    _assert_cards_equal(snap, batch)


def test_stream_card_accumulates_across_triggers(spark, tmp_path):
    """Two triggers over two chunks must equal one batch over their
    union — the duplicate count must merge across batches (a fingerprint
    seen once per chunk is a duplicate only in the merged view)."""
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    chunk1 = [(1, "alpha beta gamma delta", "en", "s1", 22)]
    chunk2 = [
        (2, "alpha beta gamma delta", "en", "s1", 22),  # exact dup of doc 1
        (3, "epsilon zeta eta theta", "en", "s2", 22),
    ]
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(chunk1, schema).write.parquet(src)
    streaming_source_data_card(spark, src, idx, ckpt).awaitTermination(60)
    mid = {r.source: r for r in data_card_from_state(spark, idx).collect()}
    assert mid["s1"].n_exact_dup_docs == 0

    spark.createDataFrame(chunk2, schema).write.mode("append").parquet(src)
    streaming_source_data_card(spark, src, idx, ckpt).awaitTermination(60)
    _assert_cards_equal(
        data_card_from_state(spark, idx),
        _batch_card(spark, spark.read.parquet(src)),
    )
    end = {r.source: r for r in data_card_from_state(spark, idx).collect()}
    assert end["s1"].n_exact_dup_docs == 1  # cross-batch duplicate counted


def test_replayed_batch_overwrite_is_idempotent(spark, tmp_path):
    """A replay rewrites its own batch_id dirs with identical content —
    the derived card must not change (the overwrite-per-batch-id
    discipline)."""
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_source_data_card(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    before = data_card_from_state(spark, idx)
    batch = _batch_card(spark, spark.read.parquet(docs_path))
    _assert_cards_equal(before, batch)

    # simulate Spark replaying batch 0: rewrite both dirs from the source
    rows = card_row_metrics(spark.read.parquet(docs_path))
    (
        rows.groupBy("source", "fingerprint")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(f"{idx}/fp/batch_id=0")
    )
    _assert_cards_equal(data_card_from_state(spark, idx), batch)


def test_fp_index_compaction_preserves_card(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    streaming_source_data_card(
        spark, docs_path, idx, ckpt, max_files_per_trigger=1
    ).awaitTermination(120)
    batch = _batch_card(spark, spark.read.parquet(docs_path))
    folded = compact_substring_index(
        spark,
        f"{idx}/fp",
        checkpoint=ckpt,
        key_col=("source", "fingerprint"),
        count_col="n",
    )
    assert folded >= 1
    _assert_cards_equal(data_card_from_state(spark, idx), batch)
    shutil.rmtree(idx)
