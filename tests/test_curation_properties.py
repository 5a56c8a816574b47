"""Property-based invariants for the curation/tokenizer operators:
self-dedup cleaning must match a sequential reference on arbitrary token
sequences (and stay idempotent); the distributed BPE trainer must equal
the sequential trainer on random corpora, not just the shipped one."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from near_public_lakehouse_spark.queries.curation import (
    SELF_DEDUP_W,
    self_dedup_frame,
)

words = st.text(alphabet="ab", min_size=1, max_size=2)  # tiny alphabet -> dups
token_lists = st.lists(words, min_size=0, max_size=24)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_self_dedup(toks: list, w: int = SELF_DEDUP_W):
    """Sequential reference: remove every token covered by a window whose
    content appeared earlier in the doc."""
    wins = [tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)]
    seen: dict = {}
    dup_starts = []
    for i, win in enumerate(wins):
        if win in seen:
            dup_starts.append(i)
        else:
            seen[win] = i
    removed = set()
    for s in dup_starts:
        removed.update(range(s, s + w))
    return [t for j, t in enumerate(toks) if j not in removed]


@given(toks=token_lists)
@settings(**_SETTINGS)
def test_self_dedup_matches_sequential_reference(spark, toks):
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = self_dedup_frame(df).collect()[0]
    want = _ref_self_dedup(toks)
    # r15 contract: NULL (not '') when nothing survives — matches the
    # oracle's array_to_string over an empty kept list
    assert out.cleaned_text == (" ".join(want) if want else None)
    assert out.removed_toks == len(toks) - len(want)


@given(toks=token_lists)
@settings(**_SETTINGS)
def test_self_dedup_idempotent_on_random_docs(spark, toks):
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    once = self_dedup_frame(df).collect()[0].cleaned_text
    again = (
        self_dedup_frame(
            spark.createDataFrame([(1, once)], "doc_id long, text string")
        )
        .collect()[0]
    )
    # NULL cleaned_text (possible only when input had zero tokens)
    # re-cleans to NULL counts — NULL-in-NULL-out, the r15 contract
    if once is None:
        assert again.removed_toks is None and again.cleaned_text is None
    else:
        assert again.removed_toks == 0
        assert again.cleaned_text == once


corpus_strategy = st.lists(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


@given(docs=corpus_strategy)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_trainer_matches_reference_on_random_corpora(spark, docs):
    from near_public_lakehouse_spark.queries.tokenizer import (
        BPE_K,
        _merge_expr,
        _pair_counts,
        _word_counts,
    )
    from pyspark.sql import functions as F

    from tests.test_tokenizer import _ref_train_clean

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words = _word_counts(df).withColumn("syms", F.split("word", "")).localCheckpoint()
    got = []
    for rank in range(1, BPE_K + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .first()
        )
        if top is None:
            break
        left, right = top.pair.split(" ", 1)
        got.append((rank, left, right, left + right, top.n_occurrences))
        words = words.withColumn("syms", F.expr(_merge_expr(left, right))).localCheckpoint()

    want_words = Counter(w for d in docs for w in d)
    assert got == _ref_train_clean(want_words, BPE_K)
