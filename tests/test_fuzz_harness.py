"""Pins for the cross-engine differential fuzz harness (VERDICT r14 task
#1, tools/fuzz_oracle.py): the corpus builder must keep emitting the
driver tables' exact physical schemas (else every sweep finding is a
schema artifact, not a semantic one), stay deterministic under its seed,
and the per-query compare path must run end-to-end. The FULL two-variant
sweep (157 oracle pairs x adversarial + empty corpora) is a
tools/close_round.py gate, not a pytest — this file keeps the generator
itself honest between rounds."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tools.fuzz_oracle import ADVERSARIAL_TEXTS, FACTS, build_corpus

REAL = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    build_corpus(str(d / "adv"), seed=42, variant="adversarial")
    build_corpus(str(d / "empty"), seed=42, variant="empty")
    return d


def test_fuzz_schemas_match_driver_tables(corpus):
    for t in TABLES:
        real = pq.read_schema(f"{REAL}/{t}.parquet")
        for variant in ("adv", "empty"):
            fuzz = pq.read_schema(str(corpus / variant / f"{t}.parquet"))
            got = [(f.name, f.type) for f in fuzz]
            want = [(f.name, f.type) for f in real]
            assert got == want, f"{variant}/{t}"


def test_fuzz_empty_variant_zeroes_fact_tables_only(corpus):
    for t in TABLES:
        n = pq.read_table(str(corpus / "empty" / f"{t}.parquet")).num_rows
        assert (n == 0) == (t in FACTS), t


def test_fuzz_corpus_is_seed_deterministic(corpus, tmp_path):
    build_corpus(str(tmp_path / "again"), seed=42, variant="adversarial")
    for t in TABLES:
        a = pq.read_table(str(corpus / "adv" / f"{t}.parquet"))
        b = pq.read_table(str(tmp_path / "again" / f"{t}.parquet"))
        assert a.equals(b), t


def test_fuzz_documents_carry_adversarial_classes(corpus):
    texts = set(
        pq.read_table(str(corpus / "adv" / "documents.parquet"))
        .column("text")
        .to_pylist()
    )
    assert None in texts  # NULL text
    for t in ADVERSARIAL_TEXTS:
        assert t in texts
    assert any(t is not None and len(t) >= 20000 for t in texts)  # giant doc


def test_fuzz_sweep_runs_one_oracle_pair(spark, corpus):
    from tools.fuzz_oracle import sweep

    findings = sweep(spark, str(corpus / "adv"), only={"token_counts"})
    assert findings == []
