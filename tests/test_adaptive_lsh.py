"""Per-source adaptive LSH (`queries/adaptive_lsh.py`): the superset
property, the adaptive-beats-fixed win on the probe corpus, and the
per-source threshold calibration branches."""

from __future__ import annotations

from near_public_lakehouse_spark.queries.adaptive_lsh import (
    THR_DEFAULT,
    THR_PERMISSIVE,
    THR_STRICT,
    _adaptive_pairs,
    _fixed_pairs,
    _s2_keys_df,
    _source_thresholds,
    _superset_pairs,
)
from near_public_lakehouse_spark.queries.registry import REGISTRY
from near_public_lakehouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_superset_property(spark):
    """Every fixed 4x3 candidate must appear under the widened 6x2 bands
    (each size-3 band contains an aligned size-2 sub-band)."""
    docs = _docs(spark)
    missing = (
        _fixed_pairs(docs)
        .join(_superset_pairs(docs), ["doc_a", "doc_b"], "left_anti")
        .count()
    )
    assert missing == 0


def test_adaptive_beats_fixed_on_probe_corpus(spark):
    """The round-6 'Done' criterion: recall >= fixed with fewer pairs,
    measured against Jaccard>=0.8 truth within the candidate superset."""
    row = REGISTRY["minhash_adaptive_eval"].fn(spark, SF_DIR).collect()[0]
    assert row.superset_violations == 0
    assert row.hits_adaptive >= row.hits_fixed, row
    assert row.pairs_adaptive < row.pairs_fixed, row
    # the win must not come from emitting nothing
    assert row.hits_adaptive > 0.95 * row.n_true, row


def test_per_source_thresholds_differentiate(spark):
    """A source of byte-identical boilerplate gets the strict threshold,
    a source of borderline near-dups the permissive one, and a mixed
    source the default — the observed-agreement calibration must pick a
    DIFFERENT rule per source from one input frame."""
    ident = [(i, "boiler", "breaking news subscribe to our newsletter today") for i in range(8)]
    # borderline: shared 12-token core, 5 unique trailing tokens per doc
    # (Jaccard ~ 0.5 between family members, never identical signatures)
    core = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    border = [
        (100 + i, "curated", core + f" uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e")
        for i in range(8)
    ]
    # mixed: a small identical core inside a larger one-token-edit family,
    # so identical pairs are a MINORITY of the source's band collisions
    mixed = [(200 + i, "mixed", "the quick brown fox jumps over the lazy dog") for i in range(4)]
    mixed += [
        (210 + i, "mixed", f"the quick brown fox jumps over the lazy dog extra{i}")
        for i in range(12)
    ]
    docs = spark.createDataFrame(ident + border + mixed, "doc_id long, source string, text string")
    thr = {r.source: r.thr for r in _source_thresholds(_s2_keys_df(docs)).collect()}
    assert thr["boiler"] == THR_STRICT, thr
    assert thr["curated"] == THR_PERMISSIVE, thr
    assert thr["mixed"] == THR_DEFAULT, thr


def test_identical_family_survives_strict_threshold(spark):
    """Strict emission on a boilerplate source must still emit the
    family's pairs (identical docs agree 12/12)."""
    docs = spark.createDataFrame(
        [(i, "boiler", "one two three four five six seven eight") for i in range(5)]
        + [(50, "boiler", "totally different text with no overlap whatsoever here")],
        "doc_id long, source string, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in _adaptive_pairs(docs).collect()}
    assert pairs == {(a, b) for a in range(5) for b in range(a + 1, 5)}


def test_cfg_join_is_broadcast(spark):
    """The per-source threshold table must reach the band join as a
    broadcast, never a shuffle."""
    plan = _adaptive_pairs(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_adaptive_assignments_agree_with_fixed_pipeline(spark):
    """Since r10 the PRODUCTION `near_dup_assignments` routes its
    candidate stage through the adaptive generator (VERDICT r9 task #4).
    It must leave the dedup product essentially unchanged vs the retained
    fixed-band graph (`dedup._near_dup_edges`, still the engine behind
    dedup_clusters): both pipelines verify candidates by true Jaccard, so
    they can only differ where one generator missed a true pair.
    Require >= 99% identical rows."""
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries.adaptive_lsh import (
        near_dup_assignments,
    )
    from near_public_lakehouse_spark.queries.dedup import (
        _near_dup_edges,
        _star_cc,
        load_table,
    )

    clusters = _star_cc(_near_dup_edges(spark, SF_DIR)).select(
        F.col("id").alias("doc_id"), F.col("lab").alias("cluster_id")
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    fixed = {
        (r.doc_id, r.cluster_id if r.cluster_id is not None else r.doc_id)
        for r in docs.join(clusters, "doc_id", "left").collect()
    }
    adaptive = {
        (r.doc_id, r.keeper_doc_id)
        for r in near_dup_assignments(spark, SF_DIR).collect()
    }
    assert len(fixed) == len(adaptive)
    agree = len(fixed & adaptive) / len(fixed)
    assert agree >= 0.99, f"agreement {agree:.4f}"


# --- per-source adaptive band COUNT (strict sources -> 4 aligned bands) ---


def test_banded_equals_adaptive_within_strict_sources(spark):
    """The pigeonhole guarantee: with EVERY source strict (>= 9/12
    threshold), at most 3 disagreeing positions cannot break 4 disjoint
    bands, so the 4-band candidate set must EQUAL the 6-band one."""
    from near_public_lakehouse_spark.queries.adaptive_lsh import (
        _banded_flat,
        _pairs_from_flat,
    )

    rows = []
    for fam in range(4):  # boilerplate families -> every source strict
        rows += [
            (fam * 100 + i, f"boiler{fam}", f"breaking news family {fam} subscribe today")
            for i in range(6)
        ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    thr = {r.source: r.thr for r in _source_thresholds(_s2_keys_df(docs)).collect()}
    assert set(thr.values()) == {THR_STRICT}
    banded = _pairs_from_flat(_banded_flat(docs))
    full = _adaptive_pairs(docs)
    assert banded.exceptAll(full).count() == 0
    assert full.exceptAll(banded).count() == 0
    assert full.count() > 0


def test_banded_scorecard_on_probe_corpus(spark):
    """Driver-checked integers: banded is a subset of adaptive, engages
    on at least one strict source, and loses no true pairs on the probe
    corpus."""
    row = REGISTRY["minhash_adaptive_bands_eval"].fn(spark, SF_DIR).collect()[0]
    assert row.subset_violations == 0
    assert row.pairs_banded <= row.pairs_adaptive
    assert row.hits_banded == row.hits_adaptive, row  # measured: no loss here
