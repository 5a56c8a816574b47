"""BPE tokenizer induction (`queries/tokenizer.py`): the distributed
trainer must EXACTLY reproduce a sequential pure-Python reference —
same pair statistics, same argmax tie-breaks, same greedy merge
application — and the learned merges must behave like BPE merges
(monotone counts, composable symbols)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.queries.tokenizer import BPE_K, _merge_expr

from tests.conftest import SF_DIR


# --- sequential reference trainer (mirrors Sennrich et al. exactly) -------


def _ref_merge(syms: tuple, pair: tuple) -> tuple:
    out, prev = [], ""
    for s in syms:
        if prev == pair[0] and s == pair[1]:
            out.append(pair[0] + pair[1])
            prev = ""
        else:
            if prev:
                out.append(prev)
            prev = s
    if prev:
        out.append(prev)
    return tuple(out)


def _ref_train_clean(words: Counter, k: int):
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), n = best
        merges.append((rank, a, b, a + b, n))
        vocab = {
            _ref_merge(syms, (a, b)): cnt for syms, cnt in vocab.items()
        }
    return merges


def _corpus_words(spark) -> Counter:
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"))
        .collect()
    )
    return Counter(r.w for r in rows)


def test_spark_merges_equal_reference_trainer(spark):
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in all_queries()["tokenizer_bpe_merges"].fn(spark, SF_DIR).collect()
    ]
    want = _ref_train_clean(_corpus_words(spark), BPE_K)
    assert got == want
    assert len(got) == BPE_K


def test_pair_frequencies_match_reference_iteration0(spark):
    words = _corpus_words(spark)
    vocab = {tuple(w): n for w, n in words.items()}
    pairs: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    want = sorted(
        ((f"{a} {b}", n) for (a, b), n in pairs.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:50]
    got = [
        (r.pair, r.n_occurrences)
        for r in all_queries()["tokenizer_pair_frequencies"].fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_merge_counts_are_monotone_nonincreasing(spark):
    counts = [
        r.pair_count
        for r in all_queries()["tokenizer_bpe_merges"].fn(spark, SF_DIR).collect()
    ]
    assert counts == sorted(counts, reverse=True)


def test_merge_fold_semantics(spark):
    """Greedy left-to-right non-overlapping: 'aaa' + (a,a) -> [aa, a];
    a merged symbol never cascades within the same pass."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        "syms array<string>",
    )
    out = [r.m for r in df.selectExpr(f"{_merge_expr('a', 'a')} AS m").collect()]
    assert out == [["aa", "a"], ["a", "b", "a", "b"], ["x"], []]
    out2 = [r.m for r in df.selectExpr(f"{_merge_expr('a', 'b')} AS m").collect()]
    assert out2 == [["a", "a", "a"], ["ab", "ab"], ["x"], []]


def test_encode_stats_equal_reference_encode(spark):
    """Train->apply: the per-source symbol counts after the 8 learned
    merges must equal a sequential reference encode exactly."""
    merges = [
        (r.left_sym, r.right_sym)
        for r in all_queries()["tokenizer_bpe_merges"].fn(spark, SF_DIR).collect()
    ]
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "source",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
        )
        .collect()
    )
    per_source: dict = {}
    encode_cache: dict = {}
    for r in rows:
        if r.w not in encode_cache:
            syms = tuple(r.w)
            for pair in merges:
                syms = _ref_merge(syms, pair)
            encode_cache[r.w] = len(syms)
        occ, chars, bpe = per_source.get(r.source, (0, 0, 0))
        per_source[r.source] = (occ + 1, chars + len(r.w), bpe + encode_cache[r.w])

    got = {
        r.source: (r.n_word_occurrences, r.char_symbols, r.bpe_symbols, r.compression)
        for r in all_queries()["tokenizer_encode_stats"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_source)
    for s, (occ, chars, bpe) in per_source.items():
        g = got[s]
        assert (g[0], g[1], g[2]) == (occ, chars, bpe), (s, g)
        assert abs(g[3] - bpe / chars) <= 1e-12
        assert g[3] < 1.0  # merges actually compress
