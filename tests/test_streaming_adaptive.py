"""Streaming adaptive-LSH calibration (`streaming_adaptive_thresholds`):
state-derived thresholds must equal the batch calibration exactly, and a
source whose duplicate regime changes mid-stream must get its new
threshold at the next trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.adaptive_lsh import (
    THR_PERMISSIVE,
    THR_STRICT,
    _s2_keys_df,
    _source_thresholds,
)
from near_public_lakehouse_spark.streaming.jobs import (
    adaptive_thresholds_from_state,
    streaming_adaptive_thresholds,
)

from tests.conftest import SF_DIR
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

CORE = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"


def _borderline(n=8, source="crawl"):
    # shared 12-token core + unique tails: near-dup families, never
    # identical signatures -> permissive regime
    return [
        (100 + i, CORE + f" uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e", "en", source, 100)
        for i in range(n)
    ]


def _boiler(n=8, source="crawl"):
    return [(200 + i, "breaking news subscribe to our newsletter today", "en", source, 47) for i in range(n)]


def _thr(spark, index_path):
    return {
        r.source: r.thr
        for r in spark.read.parquet(f"{index_path}/thresholds").collect()
    }


def test_stream_state_matches_batch_calibration(spark, tmp_path):
    """A stream that has seen the corpus must derive EXACTLY the batch
    thresholds — the masses merge exactly across batch dirs."""
    docs_path = f"{SF_DIR}/documents.parquet"
    q = streaming_adaptive_thresholds(
        spark, docs_path, str(tmp_path / "idx"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch = {
        r.source: r.thr
        for r in _source_thresholds(
            _s2_keys_df(spark.read.parquet(docs_path))
        ).collect()
    }
    streamed = {
        r.source: r.thr
        for r in adaptive_thresholds_from_state(spark, str(tmp_path / "idx")).collect()
    }
    assert streamed == batch
    assert _thr(spark, str(tmp_path / "idx")) == batch


def test_threshold_adapts_when_regime_changes_mid_stream(spark, tmp_path):
    """Trigger 1 sees a borderline near-dup source (permissive); then the
    source starts shipping byte-identical boilerplate — the NEXT trigger
    must flip it to the strict threshold, and an idle re-run must change
    nothing."""
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(_borderline(), DOC_SCHEMA).write.parquet(src)
    q = streaming_adaptive_thresholds(spark, src, idx, ckpt)
    q.awaitTermination(120)
    assert _thr(spark, idx)["crawl"] == THR_PERMISSIVE

    spark.createDataFrame(_boiler(), DOC_SCHEMA).write.mode("append").parquet(src)
    q = streaming_adaptive_thresholds(spark, src, idx, ckpt)
    q.awaitTermination(120)
    assert _thr(spark, idx)["crawl"] == THR_STRICT

    # checkpoint resume with no new files: state and snapshot unchanged
    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{idx}/thresholds").collect()
    )
    q = streaming_adaptive_thresholds(spark, src, idx, ckpt)
    q.awaitTermination(120)
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{idx}/thresholds").collect()
    )
    assert after == before


def test_calibration_indexes_compact_without_drift(spark, tmp_path):
    """The generic per-batch-count compactor must fold the compound-key
    calibration indexes (source, band_key/sig_key, n) with no change to
    the derived thresholds."""
    from near_public_lakehouse_spark.streaming.jobs import compact_substring_index

    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_borderline(), DOC_SCHEMA).write.parquet(src)
    q = streaming_adaptive_thresholds(spark, src, idx, ckpt)
    q.awaitTermination(120)
    spark.createDataFrame(_boiler(), DOC_SCHEMA).write.mode("append").parquet(src)
    q = streaming_adaptive_thresholds(spark, src, idx, ckpt)
    q.awaitTermination(120)

    before = sorted(
        tuple(r) for r in adaptive_thresholds_from_state(spark, idx).collect()
    )
    folded = compact_substring_index(
        spark, f"{idx}/band", checkpoint=ckpt, key_col=("source", "band_key"), count_col="n"
    )
    folded += compact_substring_index(
        spark, f"{idx}/sig", checkpoint=ckpt, key_col=("source", "sig_key"), count_col="n"
    )
    assert folded >= 2
    after = sorted(
        tuple(r) for r in adaptive_thresholds_from_state(spark, idx).collect()
    )
    assert after == before
