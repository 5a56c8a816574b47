"""Property-based invariants for the dedup signature machinery: MinHash
band keys must depend only on the distinct-token SET (order/multiplicity
invariant), exact duplicates must verify at jaccard 1.0, and SimHash must
be a stable 32-bit function of the token multiset."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
token_lists = st.lists(words, min_size=1, max_size=12)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string, n_chars int",
    )


@given(toks=token_lists, seed=st.integers(0, 2**31))
@settings(**_SETTINGS)
def test_band_keys_depend_only_on_token_set(spark, toks, seed):
    from near_public_lakehouse_spark.queries.dedup import _band_key_df

    import random

    rng = random.Random(seed)
    shuffled = toks[:]
    rng.shuffle(shuffled)
    # duplicate a few tokens: multiplicity must not matter either
    dup = shuffled + [rng.choice(toks) for _ in range(3)]
    df = _docs(spark, [" ".join(toks), " ".join(dup)])
    keys = {}
    for r in _band_key_df(df).collect():
        keys.setdefault(r.doc_id, set()).add(r.band_key)
    assert keys[0] == keys[1]


@given(toks=token_lists)
@settings(**_SETTINGS)
def test_exact_duplicates_verify_at_jaccard_one(spark, toks):
    from near_public_lakehouse_spark.queries.dedup import _jaccard_pairs

    text = " ".join(toks)
    df = _docs(spark, [text, text])
    pairs = _jaccard_pairs(df).collect()
    assert len(pairs) == 1
    assert pairs[0].jaccard == 1.0


@given(toks=token_lists, seed=st.integers(0, 2**31))
@settings(**_SETTINGS)
def test_simhash_is_order_invariant_32bit(spark, toks, seed):
    from near_public_lakehouse_spark.queries.dedup import SIMHASH_BITS
    import near_public_lakehouse_spark.queries.dedup as dd

    import random

    rng = random.Random(seed)
    shuffled = toks[:]
    rng.shuffle(shuffled)
    df = _docs(spark, [" ".join(toks), " ".join(shuffled)])
    rows = {r.doc_id: r.simhash for r in dd.simhash_frame(df).collect()}
    assert rows[0] == rows[1]
    assert 0 <= rows[0] < 2**SIMHASH_BITS


# --- substring_dedup_clean invariants --------------------------------------


def _clean(spark, texts):
    from near_public_lakehouse_spark.queries.dedup import substring_clean_frame

    return {
        r.doc_id: r for r in substring_clean_frame(_docs(spark, texts)).collect()
    }


@given(toks=st.lists(words, min_size=8, max_size=20), extra=words)
@settings(**_SETTINGS)
def test_identical_docs_fully_removed_unique_doc_untouched(spark, toks, extra):
    """Two identical >=8-token docs share every window -> both are fully
    cut; a doc made of tokens disjoint from any other doc keeps itself."""
    dup = " ".join(toks)
    unique = " ".join(f"zz{extra}{i}" for i in range(10))
    out = _clean(spark, [dup, dup, unique])
    assert out[0].kept_toks == 0 and out[1].kept_toks == 0
    assert out[0].cleaned_text == "" == out[1].cleaned_text
    assert out[2].removed_toks == 0
    assert out[2].cleaned_text == unique


@given(texts=st.lists(st.lists(words, min_size=1, max_size=30), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_counts_add_up_and_cleaned_is_subsequence(spark, texts):
    out = _clean(spark, [" ".join(t) for t in texts])
    for i, t in enumerate(texts):
        r = out[i]
        assert r.n_toks == len(t)
        assert r.kept_toks + r.removed_toks == r.n_toks
        cleaned = [x for x in r.cleaned_text.split(" ") if x != ""]
        assert len(cleaned) == r.kept_toks
        # cleaned tokens are a subsequence of the original token stream
        it = iter(t)
        assert all(any(tok == o for o in it) for tok in cleaned)


def test_untouched_docs_round_trip_and_case_insensitive_match(spark):
    """Round-6 ADVICE regression: the cleaner must not rewrite documents
    as a side effect. An untouched doc round-trips BYTE-EXACT (original
    casing AND whitespace runs); window matching stays case-insensitive
    (a doc differing from a duplicate only by case is still cut); and a
    partially-cleaned doc keeps the original casing of surviving tokens."""
    dup_lower = " ".join(f"w{i}" for i in range(12))
    dup_upper = dup_lower.upper()
    untouched = "The  Quick   Brown Fox " + " ".join(f"q{i}" for i in range(8))
    # 8 unique prefix tokens + the 12-token duplicated (case-varied) tail
    mixed = " ".join(f"Pre{i}" for i in range(8)) + " " + dup_lower.title()
    out = _clean(spark, [dup_lower, dup_upper, untouched, mixed])
    # case-insensitive matching: both case variants fully cut
    assert out[0].kept_toks == 0 and out[1].kept_toks == 0
    # byte-exact round trip, double/triple spaces included
    assert out[2].removed_toks == 0
    assert out[2].cleaned_text == untouched
    # survivors keep their original casing
    assert out[3].removed_toks == 12
    assert out[3].cleaned_text == " ".join(f"Pre{i}" for i in range(8))


def test_short_docs_never_removed(spark):
    """Docs below the window width have no windows -> never touched, even
    when byte-identical (that is exact dedup's job, not span removal)."""
    out = _clean(spark, ["a b c", "a b c", "a b c d e f g"])
    assert all(r.removed_toks == 0 for r in out.values())


def test_cdc_chunks_are_shift_invariant(spark):
    """Prepending tokens to a document changes only the chunks before the
    first boundary inside the shared part — every later chunk of the
    original reappears verbatim (content-defined boundaries re-sync)."""
    from near_public_lakehouse_spark.queries.dedup import cdc_chunk_instances

    base = "alpha beta the gamma key delta sort merge window epsilon zeta " \
           "table scan join order batch stream spark filter customer value"
    shifted = "noise tokens inserted here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    by_doc = {1: [], 2: []}
    for r in cdc_chunk_instances(docs).orderBy("doc_id").collect():
        by_doc[r.doc_id].append(r.chunk)
    # the original must produce >1 chunk for the property to be non-trivial
    assert len(by_doc[1]) > 1, by_doc
    # everything after the original's first chunk re-syncs in the shifted doc
    for chunk in by_doc[1][1:]:
        assert chunk in by_doc[2], (chunk, by_doc[2])


def test_cdc_chunks_partition_each_document(spark):
    """Chunk streams reassemble exactly to the token stream: joining every
    chunk back in order reproduces the document."""
    from near_public_lakehouse_spark.queries.dedup import cdc_chunk_instances

    texts = [
        (1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "single"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunk_instances(docs).collect():
        got.setdefault(r.doc_id, []).append(r.chunk)
        assert r.chunk_len >= 1
    for doc_id, text in texts:
        assert " ".join(got[doc_id]) == text, doc_id


def test_winnowing_detects_shared_runs_at_any_offset(spark):
    """Schleimer et al.'s guarantee: documents sharing a token run of
    length >= WIN_W + WIN_K - 1 share at least one fingerprint, wherever
    the run sits in each document."""
    from near_public_lakehouse_spark.queries.dedup import (
        WIN_K,
        WIN_W,
        winnowing_selections,
    )

    shared = "aa bb cc dd ee ff"  # exactly w + k - 1 = 6 tokens
    assert len(shared.split()) == WIN_W + WIN_K - 1
    docs = spark.createDataFrame(
        [
            (1, f"{shared} xx yy zz qq ww rr tt"),
            (2, f"k1 k2 k3 k4 k5 {shared}"),
            (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n0"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnowing_selections(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.key // 256)
    assert fps[1] & fps[2], (fps[1], fps[2])  # shared run detected
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_density_bound(spark):
    """At most one fingerprint per position, at least one per WIN_W
    k-grams: selected-key count is within [ceil(n_kgrams/WIN_W),
    n_kgrams]."""
    import math

    from near_public_lakehouse_spark.queries.dedup import (
        WIN_K,
        WIN_W,
        winnowing_selections,
    )
    from near_public_lakehouse_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    toks = {
        r.doc_id: len([t for t in r.text.split(" ") if t])
        for r in docs.collect()
    }
    counts = {}
    for r in winnowing_selections(docs).collect():
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    for doc_id, c in counts.items():
        n_kgrams = toks[doc_id] - WIN_K + 1
        n_windows = n_kgrams - WIN_W + 1
        assert c <= n_windows
        assert c >= math.ceil(n_windows / WIN_W)


@given(docs=st.lists(token_lists, min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_cdc_chunks_always_partition_the_token_stream(spark, docs):
    """Fuzz the partition property: for ANY token stream, CDC chunks
    reassemble to the exact document and every chunk is non-empty."""
    from near_public_lakehouse_spark.queries.dedup import cdc_chunk_instances

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunk_instances(frame).collect():
        assert r.chunk_len >= 1
        got.setdefault(r.doc_id, []).append(r.chunk)
    for doc_id, text in rows:
        if text:
            assert " ".join(got[doc_id]) == text
