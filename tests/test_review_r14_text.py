"""Regression tests for the r14 text/curation/corpus-stats review
findings: the sequence(1,0)-descends crash on short documents, byte-vs-
character word length, and value-stability of the dedup refactors."""

from __future__ import annotations

import os

import pytest

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.testing.compare import (
    compare_with_oracle,
    duckdb_oracle,
)

ROWS = [
    (1, "", "en", "s1", 0),  # zero tokens
    (2, "single", "en", "s1", 6),  # one token: sequence(1, 0) territory
    (3, "café déjà vu café déjà vu café déjà", "fr", "s1", 36),  # non-ASCII
    (4, "plain words repeat plain words repeat plain words", "en", "s2", 49),
]


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    import pandas as pd

    d = str(tmp_path_factory.mktemp("short_docs"))
    pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


@pytest.mark.parametrize(
    "name",
    [
        # r14 review: both previously CRASHED on <2-token docs
        # (sequence(1, 0) descends -> element_at(toks, 0) raises
        # INVALID_INDEX_OF_ZERO even with ANSI off); gopher additionally
        # measured word length in BYTES on the oracle side (strlen), so
        # the café doc diverged cross-engine.
        "doc_repetition_stats",
        "gopher_repetition_gate",
        # value-stability of the r14 dedup refactors on the same corpus
        "sampling_dsir_importance",
        "language_id",
        "perplexity_buckets",
        "quality_mixture_sample",
        "shard_manifest",
        "token_counts",
    ],
)
def test_short_and_nonascii_docs_match_oracle(spark, short_doc_dir, name):
    q = all_queries()[name]
    con = duckdb_oracle(short_doc_dir)
    try:
        assert compare_with_oracle(q.fn(spark, short_doc_dir), con, q.oracle) == []
    finally:
        con.close()


def test_gopher_gate_keeps_short_docs_with_zero_shares(spark, short_doc_dir):
    out = all_queries()["gopher_repetition_gate"].fn(spark, short_doc_dir)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # no crash, no dropped rows
