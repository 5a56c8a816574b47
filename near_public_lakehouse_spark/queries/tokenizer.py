"""Distributed BPE tokenizer induction over the documents corpus.

`token_counts_bpe` (queries/text.py) ESTIMATES a subword budget with a
fixed pre-tokenizer regex; this module LEARNS the merges — byte-pair
encoding vocabulary induction (Sennrich et al., ACL 2016) as a
distributed computation:

- `tokenizer_pair_frequencies` — the iteration-0 statistic: adjacent
  symbol-pair counts over every word occurrence, the corpus-wide
  aggregation each BPE step argmaxes over. Oracle-checked.
- `tokenizer_bpe_merges` — the first K merges actually learned: a
  driver loop of K rounds, each one pair-count aggregation + a 1-row
  argmax collect + a per-word greedy merge fold. Rows-only for the
  driver (the argmax chain is not expressible as one SQL statement);
  exact-equality against a pure-Python reference trainer is pinned in
  tests/test_tokenizer.py.

Scale design: training runs on the DISTINCT-word table weighted by
occurrence count (the classic BPE-trainer optimization) — after the one
corpus-wide word count, every iteration's shuffle is VOCABULARY-bounded
(Heaps' law: ~millions of rows at 100 TB, not trillions), the merge fold
is a per-row `aggregate` HOF inside codegen, and driver state per round
is exactly one argmax row. K rounds = K vocabulary-sized shuffles, the
same bounded-iteration discipline as `kmeans_clusters`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.queries.text import TOKENS_SQL, tokens_col
from near_public_lakehouse_spark.sources.tables import load_table

BPE_K = 8  # merges to learn
PAIR_TOP = 50

# pair key is "left right" (space-joined); symbols never contain spaces
# because words come from whitespace tokenization.


def _word_counts(docs: DataFrame) -> DataFrame:
    """(word, n): occurrence-weighted distinct words — the vocabulary
    table every iteration works on."""
    return (
        docs.select(F.explode(tokens_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, n_occurrences) over adjacent symbols of the `syms` column,
    weighted by word count — counts every adjacent position (overlapping,
    the standard BPE statistic)."""
    pairs = F.expr(
        "CASE WHEN size(syms) < 2 THEN array() ELSE "
        "transform(sequence(1, size(syms) - 1), "
        "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) END"
    )
    return (
        words.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
    )


def _merge_expr(left: str, right: str) -> str:
    """SQL for one greedy left-to-right non-overlapping merge pass of
    (left, right) -> left||right over the `syms` array: an `aggregate`
    fold whose accumulator holds the output plus the one pending symbol,
    consuming both members when the pair matches so a merged symbol never
    re-merges with what follows (BPE semantics; 'aaa' + (a,a) -> [aa, a])."""
    ql, qr = left.replace("'", "\\'"), right.replace("'", "\\'")
    return (
        "aggregate(syms, "
        "named_struct('out', cast(array() as array<string>), 'prev', cast('' as string)), "
        f"(acc, s) -> IF(acc.prev = '{ql}' AND s = '{qr}', "
        f"named_struct('out', concat(acc.out, array('{ql}{qr}')), 'prev', ''), "
        "named_struct('out', IF(acc.prev = '', acc.out, concat(acc.out, array(acc.prev))), 'prev', s)), "
        "acc -> IF(acc.prev = '', acc.out, concat(acc.out, array(acc.prev))))"
    )


@query(
    "tokenizer_pair_frequencies",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=f"""
WITH w AS (SELECT unnest({TOKENS_SQL}) AS word FROM documents),
p AS (
  SELECT unnest(list_transform(range(1, len(word)),
                i -> word[i] || ' ' || word[i+1])) AS pair
  FROM w
)
SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
FROM p
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {PAIR_TOP}
""",
)
def tokenizer_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent character-pair frequencies over every word occurrence
    — BPE iteration 0's argmax input. Computed on the occurrence-weighted
    distinct-word table, so the explode and shuffle are vocabulary-sized;
    the only corpus-sized step is the word count itself."""
    docs = load_table(spark, sf_dir, "documents")
    words = _word_counts(docs).withColumn("syms", F.split("word", ""))
    return (
        _pair_counts(words)
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(PAIR_TOP)
    )


@query(
    "tokenizer_bpe_merges",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=None,  # K-round argmax chain; pinned vs a pure-Python trainer
)
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {K} BPE merges learned from the corpus: each round
    aggregates vocabulary-bounded pair counts, collects the single argmax
    row (ties broken by pair text — deterministic under any partitioning),
    and rewrites the symbol table with the greedy merge fold. Exact
    equality with a sequential reference trainer is pinned in
    tests/test_tokenizer.py; the driver records a rows-only check (the
    data-dependent argmax chain is not one SQL statement)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        _word_counts(docs).withColumn("syms", F.split("word", "")).localCheckpoint()
    )
    merges = []
    for rank in range(1, BPE_K + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .first()
        )
        if top is None:
            break
        left, right = top.pair.split(" ", 1)
        merges.append((rank, left, right, left + right, top.n_occurrences))
        words = words.withColumn(
            "syms", F.expr(_merge_expr(left, right))
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    ).orderBy("merge_rank")


@query(
    "tokenizer_encode_stats",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=None,  # depends on the learned (data-dependent) merge chain
)
def tokenizer_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> apply, end to end: learn the first {K} BPE merges on the
    global vocabulary (same loop as `tokenizer_bpe_merges`), encode every
    word with them, and report the per-source token-budget effect — word
    occurrences, character symbols before, subword symbols after, and the
    compression ratio a real tokenizer run would deliver. The encode is
    the K-fold merge chain applied to the (source, word)-distinct table:
    vocabulary-x-sources bounded, never corpus-bounded. Rows-only for
    the driver (the merge chain is data-dependent); exact equality with
    the sequential reference encode is pinned in tests/test_tokenizer.py."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        _word_counts(docs).withColumn("syms", F.split("word", "")).localCheckpoint()
    )
    merges = []
    train = words
    for _ in range(BPE_K):
        top = (
            _pair_counts(train)
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .first()
        )
        if top is None:
            break
        left, right = top.pair.split(" ", 1)
        merges.append((left, right))
        train = train.withColumn(
            "syms", F.expr(_merge_expr(left, right))
        ).localCheckpoint()

    by_source = (
        docs.select("source", F.explode(tokens_col()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("word", ""))
    )
    encoded = by_source
    for left, right in merges:
        encoded = encoded.withColumn("syms_next", F.expr(_merge_expr(left, right))).drop(
            "syms"
        ).withColumnRenamed("syms_next", "syms")
    return (
        encoded.groupBy("source")
        .agg(
            F.sum("n").alias("n_word_occurrences"),
            F.sum(F.col("n") * F.length("word")).alias("char_symbols"),
            F.sum(F.col("n") * F.size("syms")).alias("bpe_symbols"),
        )
        .withColumn(
            "compression",
            F.col("bpe_symbols").cast("double") / F.col("char_symbols"),
        )
        .orderBy("source")
    )
