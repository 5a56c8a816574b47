"""Adversarial-skew pins for the dedup candidate/verify pipeline
(VERDICT r11 task #5).

SCALE.md pins ~linear candidate growth on the shipped corpus mix; these
tests pin what happens on the corpus mix built to be hostile — one
pathological source holding 90% of documents with colliding signatures
(`testing/skewed.skewed_corpus`). The quantitative exponents live in
SCALE.md (produced by tools/skew_probe_dedup.py); what pytest pins is:

1. the signature-group compression COLLAPSES the hot key in the
   identical-signature regime: the quadratic band self-join sees exactly
   one representative for the 90% group, so its input is O(groups), not
   O(docs);
2. the end-to-end assignments product stays CORRECT under skew in both
   regimes and both verify paths (broadcast and shuffle): every hot doc
   assigns to the lowest hot doc_id, every cold doc keeps itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import dedup as _dd
from near_public_lakehouse_spark.queries.adaptive_lsh import (
    _adaptive_pairs,
    _assignments_frame,
)
from near_public_lakehouse_spark.queries.dedup import _sig_df, sig_key_col
from near_public_lakehouse_spark.testing.skewed import skewed_corpus

N = 300
N_HOT = 270  # 0.9 * N


def test_identical_regime_collapses_to_one_signature_group(spark):
    """90% of docs share one token SET -> exactly one (source, signature)
    group for the hot source, so the quadratic band join runs on ONE
    representative — the hot key is bounded by construction, which is the
    claim the group compression makes at 100 TB."""
    docs = skewed_corpus(spark, N, "identical").localCheckpoint()
    groups = (
        _sig_df(docs, "source")
        .withColumn("sk", sig_key_col())
        .groupBy("source", "sk")
        .count()
    )
    hot = groups.filter(F.col("source") == "hotsrc").collect()
    assert len(hot) == 1 and hot[0]["count"] == N_HOT
    # every cold doc is its own singleton group
    assert groups.filter(F.col("source") != "hotsrc").count() == N - N_HOT


def test_identical_regime_candidates_are_exactly_the_hot_clique(spark):
    """All within-group pairs are true candidates (identical signatures
    agree 12/12) and cold docs collide with nothing: the candidate set is
    exactly the hot clique's m(m-1)/2 pairs — quadratic because the
    ANSWER is quadratic, not because the plan lost its bounds."""
    docs = skewed_corpus(spark, N, "identical").localCheckpoint()
    pairs = _adaptive_pairs(docs)
    assert pairs.count() == N_HOT * (N_HOT - 1) // 2
    assert pairs.filter((F.col("doc_a") >= N_HOT) | (F.col("doc_b") >= N_HOT)).count() == 0


@pytest.mark.parametrize("regime", ["identical", "near"])
@pytest.mark.parametrize("path", ["broadcast", "shuffle"])
def test_assignments_correct_under_skew(spark, regime, path, monkeypatch):
    """End-to-end `near_dup_assignments` semantics hold on the hostile
    corpus in BOTH verify regimes: identical token sets have Jaccard 1,
    near docs >= 0.90 >= VERIFY_JACCARD, so the whole hot source is one
    family keyed by its lowest doc_id; cold docs keep themselves."""
    if path == "shuffle":
        monkeypatch.setattr(_dd, "VERIFY_BROADCAST_MAX_REPS", 0)
    docs = skewed_corpus(spark, N, regime).localCheckpoint()
    rows = {r["doc_id"]: r for r in _assignments_frame(docs).collect()}
    assert len(rows) == N
    for d in range(N_HOT):
        assert rows[d]["keeper_doc_id"] == 0, (regime, path, d)
        assert rows[d]["is_keeper"] == (d == 0)
    for d in range(N_HOT, N):
        assert rows[d]["keeper_doc_id"] == d and rows[d]["is_keeper"]


def test_hot_group_expansion_splits_under_aqe_when_byte_visible(spark, monkeypatch):
    """The 100 TB mitigation pin (VERDICT r11 task #5): in the non-broadcast
    regime the quadratic member-pair ENUMERATION of a hot signature group
    runs through an ENSURE_REQUIREMENTS shuffle join on the group id — a
    single hot key (the r15 gid-keying made it one BIGINT; before that,
    the (source, sk) string pair). At probe scale the hot partition is
    only KBs, so AQE's byte-based skew detection is blind to the
    row-multiplication CPU (the measured big-path cliff in SCALE.md); at
    100 TB the same ROW skew is GBs of shuffle bytes and AQE splits it.
    Emulated here by lowering the byte thresholds to toy scale (r15: the
    16-byte gid rows shrank the hot partition ~4x, so the emulation
    thresholds shrink with them): the FINAL adaptive plan of the
    production candidate stage must carry `skew=true`, with output
    identical."""
    from near_public_lakehouse_spark.queries import dedup as _dd

    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in lowered}
    monkeypatch.setattr(_dd, "VERIFY_BROADCAST_MAX_REPS", 0)
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        docs = skewed_corpus(spark, 2 * N, "identical").localCheckpoint()
        pairs = _adaptive_pairs(docs)
        got = pairs.collect()
        m = 2 * N_HOT
        assert len(got) == m * (m - 1) // 2
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_hot_group_salted_expansion_is_output_identical(spark, monkeypatch):
    """Above WITHIN_HOT_GROUP_MEMBERS the within-group enumeration routes
    hot groups through operators/skew.salted_join (no single task owns a
    hot group's m^2/2 pairs even when AQE's byte heuristics are blind to
    the row-quadratic CPU). Exactness pin: threshold forced below the
    fixture's group size -> byte-identical candidate pairs, salted plan."""
    import near_public_lakehouse_spark.queries.adaptive_lsh as AL

    docs = skewed_corpus(spark, N, "identical").localCheckpoint()
    base = sorted(map(tuple, AL._adaptive_pairs(docs).select("doc_a", "doc_b").collect()))
    monkeypatch.setattr(AL, "WITHIN_HOT_GROUP_MEMBERS", 100)
    salted = AL._adaptive_pairs(docs)
    assert sorted(map(tuple, salted.select("doc_a", "doc_b").collect())) == base
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, plan[:2000]
