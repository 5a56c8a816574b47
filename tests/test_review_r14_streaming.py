"""Regression tests for the r14 streaming/jobs + evolution review findings:
balances fence parking, CDC-index compaction column preservation, data-card
null-quality parity, and the schema-probe TOCTOU retry. (The sessionizer
findings are pinned in tests/test_sessions.py; the NULL-hash actions drop
in this file's actions test.)"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


# --- balances epoch-fence parking -------------------------------------------


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "block_height long, block_date string, affected_account_id string, "
        "nonstaked_balance string, staked_balance string, storage_usage long",
    ).withColumn("block_date", F.col("block_date").cast("date"))


def test_balances_rows_past_the_epoch_fence_park_not_drop(spark, tmp_path):
    """r14 review: rows dated past epoch_date were silently DISCARDED
    from a checkpointed stream (batch committed, rows gone for every
    later epoch). They must park and fold once the fence advances."""
    from near_public_lakehouse_spark.streaming.jobs import (
        flush_pending_balances,
        streaming_public_balances,
    )

    changes_dir = str(tmp_path / "changes")
    rows = [
        (1, "2024-01-01", "a.near", "10", "0", 1),
        (9, "2024-01-02", "future.near", "77", "0", 1),  # past the fence
        (3, "2024-01-01", "b.near", "30", "0", 1),
    ]
    _changes(spark, rows).coalesce(1).write.parquet(os.path.join(changes_dir, "b0"))

    ckpt = str(tmp_path / "ckpt")
    streaming_public_balances(
        spark, os.path.join(changes_dir, "b*"), str(tmp_path / "out"), ckpt,
        "2024-01-01",
    ).awaitTermination(240)

    state = spark.read.parquet(os.path.join(ckpt, "balances_state"))
    assert {r.affected_account_id for r in state.collect()} == {"a.near", "b.near"}
    parked = spark.read.parquet(os.path.join(ckpt, "pending_balances"))
    assert [r.affected_account_id for r in parked.collect()] == ["future.near"]

    # epoch advances: the parked row folds in WITHOUT a checkpoint reset
    left = flush_pending_balances(
        spark, os.path.join(changes_dir, "b*"), ckpt, "2024-01-02"
    )
    assert left == 0
    state = spark.read.parquet(os.path.join(ckpt, "balances_state"))
    assert {r.affected_account_id for r in state.collect()} == {
        "a.near", "b.near", "future.near",
    }


# --- compaction preserves non-count index columns ---------------------------


def test_compacting_the_cdc_index_preserves_reader_columns(spark, tmp_path):
    """r14 review: the old fold kept only (key, count_col), so compacting
    the CDC chunk index destroyed chunk_len / n_docs / example_doc_id —
    columns cdc_families_from_state aggregates. Compact-then-read must
    equal read-all-dirs."""
    from near_public_lakehouse_spark.streaming.jobs import (
        cdc_families_from_state,
        compact_substring_index,
        streaming_cdc_chunks,
    )

    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    text = "p1 p2 p3 p4 p5 p6 p7 p8 p9"
    for i, b in enumerate(("b0", "b1")):
        spark.createDataFrame(
            [(i + 1, text, "en", "s", len(text))], DOC_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(src, b))
    streaming_cdc_chunks(
        spark, os.path.join(src, "b*"), idx, ckpt, max_files_per_trigger=1
    ).awaitTermination(240)

    def fams():
        return {
            r.chunk_hash: (r.chunk_len, r.n_occurrences, r.n_docs, r.example_doc_id)
            for r in cdc_families_from_state(spark, idx).collect()
        }

    before = fams()
    assert before  # the cross-batch duplicate family exists
    folded = compact_substring_index(
        spark,
        f"{idx}/chunks",
        checkpoint=ckpt,
        key_col="chunk_hash",
        count_col=["n_occurrences", "n_docs"],
    )
    assert folded == 2
    assert sorted(os.listdir(f"{idx}/chunks")) == ["batch_id=-1"]
    assert fams() == before


# --- data card: null-quality parity ----------------------------------------


def test_card_mean_quality_parity_with_empty_doc(spark, tmp_path):
    """r14 review: a no-token doc has NULL quality; batch avg(q) excludes
    it from the denominator, the stream fold divided by n_docs. The two
    must agree (and the NULL fingerprint must not count as distinct)."""
    from tests.test_streaming_card import _assert_cards_equal, _batch_card

    from near_public_lakehouse_spark.streaming.jobs import (
        data_card_from_state,
        streaming_source_data_card,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s", 22),
            (2, "", "en", "s", 0),  # NULL q, NULL-adjacent fingerprint path
            (3, "alpha beta gamma delta", "en", "s", 22),
        ],
        DOC_SCHEMA,
    )
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    idx = str(tmp_path / "idx")
    streaming_source_data_card(
        spark, src, idx, str(tmp_path / "ckpt")
    ).awaitTermination(240)
    _assert_cards_equal(data_card_from_state(spark, idx), _batch_card(spark, docs))


# --- schema probe: deleted-file retry ---------------------------------------


def test_probe_json_schema_survives_path_not_found(spark, tmp_path):
    """r14 review: ignoreMissingFiles never covers an explicitly-listed
    path deleted before Spark's own listing — PATH_NOT_FOUND killed the
    stream start. The probe must drop the vanished file and retry."""
    import json as _json
    from unittest import mock

    from pyspark.errors import AnalysisException
    from pyspark.sql.readwriter import DataFrameReader

    from near_public_lakehouse_spark.streaming import evolution as ev

    d = str(tmp_path / "zone")
    os.makedirs(d)
    keep = os.path.join(d, "a.json")
    doomed = os.path.join(d, "b.json")
    with open(keep, "w") as fh:
        fh.write(_json.dumps({"id": 1, "v": "x"}) + "\n")
    with open(doomed, "w") as fh:
        fh.write(_json.dumps({"id": 2, "v": "y"}) + "\n")

    real_load = DataFrameReader.load
    state = {"raised": False}

    def flaky(self, path=None, **kw):
        if not state["raised"]:
            state["raised"] = True
            os.remove(doomed)  # the landing zone's retention races us
            raise AnalysisException(
                f"[PATH_NOT_FOUND] Path does not exist: {doomed}."
            )
        return real_load(self, path, **kw)

    with mock.patch.object(DataFrameReader, "load", flaky):
        schema = ev.probe_json_schema(spark, d)
    assert state["raised"] and schema is not None
    assert {f.name for f in schema.fields} == {"id", "v"}

    # a non-PATH_NOT_FOUND AnalysisException still surfaces
    def broken(self, path=None, **kw):
        raise AnalysisException("[SOMETHING_ELSE] boom")

    with mock.patch.object(DataFrameReader, "load", broken):
        try:
            ev.probe_json_schema(spark, d)
            raise AssertionError("expected AnalysisException")
        except AnalysisException:
            pass
