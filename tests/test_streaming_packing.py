"""Streaming training-sequence packing (`streaming_sequence_packing`):
doc_id-ordered batches must reproduce the batch `training_sequence_packing`
exactly; arrival-order packing preserves the full-sequence invariant and
loses no tokens; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.streaming.jobs import (
    packing_from_state,
    packing_stats_from_state,
    streaming_sequence_packing,
)

from tests.conftest import SF_DIR
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(df):
    return sorted((r.seq_id, r.doc_id, r.n_tokens) for r in df.collect())


def test_single_batch_stream_equals_batch_packing(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    idx = str(tmp_path / "idx")
    streaming_sequence_packing(
        spark, docs_path, idx, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    got = _rows(packing_from_state(spark, idx))
    want = _rows(all_queries()["training_sequence_packing"].fn(spark, SF_DIR))
    assert got == want and got

    sgot = {
        r.seq_id: (r.n_docs, r.n_tokens, r.is_full)
        for r in packing_stats_from_state(spark, idx).collect()
    }
    swant = {
        r.seq_id: (r.n_docs, r.n_tokens, r.is_full)
        for r in all_queries()["training_packing_stats"].fn(spark, SF_DIR).collect()
    }
    assert sgot == swant


def test_ordered_multi_batch_fold_equals_batch_and_replay_is_idempotent(
    spark, tmp_path
):
    """Three doc_id-ordered triggers == the batch query over the union:
    the cross-batch offset shift reconstructs the exact global token
    stream. Re-running the drained stream changes nothing."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").orderBy("doc_id")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    n = docs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    b1, b2, b3 = set(ids[:cut1]), set(ids[cut1:cut2]), set(ids[cut2:])
    for i, batch in enumerate([b1, b2, b3]):
        docs.filter(F.col("doc_id").isin(batch)).write.mode("append").parquet(src)
        streaming_sequence_packing(spark, src, idx, ckpt).awaitTermination(120)

    got = _rows(packing_from_state(spark, idx))
    want = _rows(all_queries()["training_sequence_packing"].fn(spark, SF_DIR))
    assert got == want

    # replay: nothing new to read -> fold unchanged
    streaming_sequence_packing(spark, src, idx, ckpt).awaitTermination(120)
    assert _rows(packing_from_state(spark, idx)) == want


def test_arrival_order_packing_keeps_invariants(spark, tmp_path):
    """Out-of-doc_id-order arrival packs in ARRIVAL order (the dataloader
    contract): every sequence except the last is exactly full, token
    totals are conserved, and each doc's contributions sum to its length."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    texts = {
        7: "a b c " * 40,   # 120 tokens
        3: "d e " * 100,    # 200 tokens
        9: "f " * 300,      # 300 tokens
    }
    # arrival order 7, then 3, then 9 — reverse of doc_id for 3 vs 7
    for doc_id in [7, 3, 9]:
        t = texts[doc_id]
        spark.createDataFrame(
            [(doc_id, t, "en", "s", len(t))], DOC_SCHEMA
        ).write.mode("append").parquet(src)
        streaming_sequence_packing(spark, src, idx, ckpt).awaitTermination(60)

    from near_public_lakehouse_spark.queries.curation import PACK_SEQ_LEN

    rows = packing_from_state(spark, idx).collect()
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tokens
    assert per_doc == {7: 120, 3: 200, 9: 300}
    stats = packing_stats_from_state(spark, idx).collect()
    assert [r.seq_id for r in stats] == list(range(len(stats)))
    assert all(r.is_full for r in stats[:-1])
    assert sum(r.n_tokens for r in stats) == 620
    # arrival order: doc 7 owns the head of sequence 0, not doc 3
    first = min(rows, key=lambda r: (r.seq_id, -r.n_tokens))
    assert any(r.doc_id == 7 and r.seq_id == 0 for r in rows)
    # doc 3 starts at global offset 120 -> it appears in seq 0 too
    assert any(r.doc_id == 3 and r.seq_id == 0 for r in rows)


def test_fold_orders_batches_numerically_without_type_inference(
    spark, tmp_path
):
    """ADVICE r11: the cross-batch shift must order batch_id NUMERICALLY
    even when partitionColumnTypeInference is off (directory-name column
    reads as string, and '10' < '2' lexicographically would shift every
    later batch's global offset). Write 11 single-doc batches so batch 10
    exists, disable inference, and check the fold still packs in arrival
    order with contiguous global offsets."""
    from near_public_lakehouse_spark.queries.curation import PACK_SEQ_LEN

    idx = str(tmp_path / "idx")
    # one doc per batch, each exactly 1/4 of a sequence, within-batch
    # offset 0 — global offset must be batch_id * tok
    tok = PACK_SEQ_LEN // 4
    for b in range(11):
        spark.createDataFrame(
            [(b, 0, tok)], "doc_id long, start long, n_tok long"
        ).write.mode("overwrite").parquet(f"{idx}/spans/batch_id={b}")

    prev = spark.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        got = {
            r.doc_id: (r.seq_id, r.n_tokens)
            for r in packing_from_state(spark, idx).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", prev
        )
    # arrival order == batch_id order: doc b sits in sequence b // 4
    assert got == {b: (b // 4, tok) for b in range(11)}
