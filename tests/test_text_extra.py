"""BPE-ish pre-tokenizer (`queries/text.py BPE_PAT`): behavioral pin on
adversarial strings and Spark/DuckDB parity of the pattern semantics.
The full-corpus oracle equality runs in test_queries_oracle.py; these
tests pin WHY it holds — no construct where Java-regex and RE2 disagree."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.text import BPE_PAT, _BPE_SQL_PAT

TRICKY = [
    "it's 42 degrees—wow!  'quoted' end",
    "can't won't we're i'll you've i'm he'd",
    "   leading spaces",
    "trailing spaces   ",
    "under_score mixed123abc 3.14e10",
    "!!!???...,,,'''",
    "",
    "'",
    "a",
]


def _spark_tokens(spark, s: str) -> list[str]:
    row = spark.range(1).select(
        F.regexp_extract_all(F.lit(s), F.lit(BPE_PAT), 0).alias("t")
    ).collect()[0]
    return list(row.t)


def _duck_tokens(s: str) -> list[str]:
    lit = s.replace("'", "''")
    return duckdb.sql(
        f"SELECT regexp_extract_all('{lit}', '{_BPE_SQL_PAT}')"
    ).fetchone()[0]


@pytest.mark.parametrize("s", TRICKY)
def test_spark_duckdb_tokenization_parity(spark, s):
    assert _spark_tokens(spark, s) == _duck_tokens(s), s


@pytest.mark.parametrize("s", TRICKY)
def test_tokenization_is_a_partition(spark, s):
    """Matches must cover the input exactly, in order, with no gaps —
    i.e. the alternation has no dead zones that silently drop text."""
    assert "".join(_spark_tokens(spark, s)) == s


def test_contractions_are_single_tokens(spark):
    toks = _spark_tokens(spark, "can't we're i'll")
    assert "'t" in toks and "'re" in toks and "'ll" in toks


def test_bpe_counts_exceed_ws_on_punct_heavy_text(spark):
    """The estimator's reason to exist: punctuation-heavy text costs more
    subword tokens than its whitespace word count suggests."""
    s = "end. of. sentence! (with) [brackets] -- and, punctuation;"
    bpe = [t for t in _spark_tokens(spark, s) if t.strip()]
    assert len(bpe) > len(s.split())


def test_unigram_logprob_ranks_gibberish_below_fluent(spark):
    """The LM proxy's reason to exist: a doc of corpus-rare tokens must
    score strictly below a doc of corpus-common tokens."""
    from near_public_lakehouse_spark.queries.corpus_stats import (
        unigram_logprob_scores,
    )
    import near_public_lakehouse_spark.sources.tables as tables

    common = "the the the of of to and in a the of to"
    rare = "zxqv wvvq qqzx vvxz xqzw zzzv qwxv vzqx wwqz xvzq zqwv qvwz"
    docs = spark.createDataFrame(
        [(0, common, "en", "s", len(common))]
        + [(1, rare, "en", "s", len(rare))]
        + [(i, "the quick brown fox of the morning to the river and back in town", "en", "s", 64) for i in range(2, 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = tables.load_table
    try:
        tables.load_table = lambda spark_, sf_dir_, name_: docs
        import near_public_lakehouse_spark.queries.corpus_stats as cs
        cs.load_table = tables.load_table
        scores = {r.doc_id: r.avg_logprob for r in unigram_logprob_scores(spark, "ignored").collect()}
    finally:
        tables.load_table = orig
        import near_public_lakehouse_spark.queries.corpus_stats as cs
        cs.load_table = orig
    assert scores[1] < scores[0], scores
    assert all(scores[1] < scores[i] for i in range(2, 12)), scores


def test_gopher_gate_shares_match_shuffle_computation(spark):
    """The per-row sorted-run bigram shares must equal the shuffle-based
    (doc_id, bigram) groupBy shares from doc_repetition_stats — the two
    engines compute the same statistic by different plans."""
    from near_public_lakehouse_spark.queries import all_queries
    from tests.conftest import SF_DIR

    gate = {
        r.doc_id: (r.top_bigram_share, r.dup_bigram_share)
        for r in all_queries()["gopher_repetition_gate"].fn(spark, SF_DIR).collect()
    }
    rep = {
        r.doc_id: (r.top_bigram_share, r.dup_bigram_share)
        for r in all_queries()["doc_repetition_stats"].fn(spark, SF_DIR).collect()
    }
    assert set(rep) <= set(gate)
    for doc_id, shares in rep.items():
        assert gate[doc_id] == shares, doc_id


def test_bigram_lm_separates_transition_structure(spark, tmp_path):
    """Two documents with the SAME token multiset (identical unigram
    score) must separate under the bigram LM: deterministic transitions
    score far higher than scrambled ones."""
    from near_public_lakehouse_spark.queries import all_queries

    ordered = " ".join(["x y"] * 12)              # x->y, y->x only
    scrambled = " ".join(["x x y y x y y x"] * 3)  # same 12 x, 12 y
    base = [
        (i + 10, f"w{i} filler common tokens w{i} more", "en", "s", 30)
        for i in range(6)
    ]
    rows = [(1, ordered, "en", "s", len(ordered)), (2, scrambled, "en", "s", len(scrambled))] + base
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: r.avg_logprob_bigram
        for r in all_queries()["lm_bigram_scores"].fn(spark, d).collect()
    }
    assert got[1] > got[2] + 0.1, got
