"""Regression tests for the r14 dedup/adaptive-LSH review findings:
zero-token documents must behave identically in Spark and the DuckDB
oracles (NULL band/sig keys, no simhash row), and the shared-signature
eval restructure must not move any oracle hash."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.testing.compare import (
    compare_with_oracle,
    duckdb_oracle,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

ROWS = [
    (1, "apple banana cherry date egg fig grape", "en", "s1", 38),
    (2, "apple banana cherry date egg fig grape", "en", "s1", 38),  # dup of 1
    (3, "", "en", "s1", 0),  # zero tokens
    (4, "   ", "en", "s2", 3),  # whitespace only -> zero tokens
    (5, "totally different words entirely here now", "en", "s2", 41),
]


@pytest.fixture(scope="module")
def empty_doc_dir(spark, tmp_path_factory):
    # single-FILE parquet, the driver's testdata layout (DuckDB's view
    # reads the path directly)
    import pandas as pd

    d = str(tmp_path_factory.mktemp("empty_docs"))
    pdf = pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def test_zero_token_docs_get_null_band_and_sig_keys(spark, empty_doc_dir):
    """r14 review (verified empirically by the reviewer): Spark's
    concat_ws SKIPPED the all-NULL min-hashes, emitting '0:'-style band
    keys and md5('') sig keys for every empty doc — every empty-doc pair
    collided while the oracle's NULL-propagating `||` emitted nothing."""
    from near_public_lakehouse_spark.queries.dedup import (
        _band_key_df,
        _sig_df,
        sig_key_col,
    )

    docs = spark.read.parquet(os.path.join(empty_doc_dir, "documents.parquet"))
    keys = _band_key_df(docs.filter(F.col("doc_id").isin(3, 4)))
    assert keys.count() > 0
    assert keys.filter(F.col("band_key").isNotNull()).count() == 0
    sk = (
        _sig_df(docs)
        .withColumn("sk", sig_key_col())
        .filter(F.col("doc_id").isin(3, 4))
    )
    assert sk.filter(F.col("sk").isNotNull()).count() == 0


@pytest.mark.parametrize(
    "name",
    [
        "minhash_lsh_candidates",
        "simhash_fingerprints",
        "minhash_lsh_adaptive",
        "minhash_lsh_adaptive_bands",
        "near_dup_assignments",
        "minhash_adaptive_eval",
        "minhash_adaptive_bands_eval",
    ],
)
def test_cross_engine_parity_on_corpus_with_empty_docs(
    spark, empty_doc_dir, name
):
    """The previously-latent divergence made real: every dedup-family
    oracle query must hash-match DuckDB on a corpus CONTAINING zero-token
    documents (the shipped corpora have none, so the driver sweep could
    never catch this class)."""
    q = all_queries()[name]
    con = duckdb_oracle(empty_doc_dir)
    try:
        assert compare_with_oracle(q.fn(spark, empty_doc_dir), con, q.oracle) == []
    finally:
        con.close()


def test_empty_docs_are_their_own_exact_dup_family(spark, empty_doc_dir):
    """Empty docs share md5('')-of-text FINGERPRINTS (exact dedup handles
    them); the LSH stage must not also pair them. near_dup_assignments
    keeps every doc exactly once with the empty family collapsing to its
    lowest doc_id."""
    out = all_queries()["near_dup_assignments"].fn(spark, empty_doc_dir)
    rows = {r.doc_id: r.keeper_doc_id for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[3] == 3 and rows[4] == 3  # '' and '   ' normalize identically
