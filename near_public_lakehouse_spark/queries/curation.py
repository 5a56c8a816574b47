"""Corpus-curation operators: the publish side of a training-data pipeline.

The dedup/quality/tokenizer modules measure and transform documents; this
module covers what a pipeline does right before (and right after) writing
training data out:

- `self_dedup_clean` — WITHIN-document repeated-window removal, the
  intra-doc half of Lee et al.'s "Deduplicating Training Data Makes
  Language Models Better" (the cross-doc half is
  `dedup.substring_dedup_clean`). Pure per-row higher-order functions:
  no explode, no shuffle, no Python — embarrassingly parallel at any
  corpus size.
- `shard_manifest` — deterministic seeded hash-sharding of the corpus
  into training shards plus the per-shard manifest row (doc counts,
  token budgets, id fences) a dataloader consumes. Hash placement means
  NO global sort or range partitioning: adding shards rehashes uniformly
  and the plan is one groupBy at any scale.
- `source_data_card` — the per-source "data card" report real curation
  teams publish: volume, token budgets under both tokenizers, exact-dup
  rate, quality-gate failure counts, mean quality. One two-level
  aggregation; map-side partials shrink the shuffle to |sources|.
- `perplexity_buckets` — corpus composition by unigram-LM quality band
  (the CCNet head/middle/tail split generalized to ln-width buckets):
  how many documents and training tokens live at each fluency level.
  Fixed absolute bucket edges (floor of mean logprob) rather than
  quantiles, so bucket membership is engine-exact and the operator needs
  no global sort.

Reference parity: the reference pipeline stops at per-table gold marts
(`NB/Gold *.py`); curation packaging is part of the beyond-reference
LLM-pipeline surface (SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.numeric import md5_prefix_int

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.queries.text import (
    BPE_PAT,
    QF_MAX_AVG_WORD_LEN,
    QF_MAX_STOPWORD_RATIO,
    QF_MIN_DISTINCT_RATIO,
    QF_MIN_TOKENS,
    STOP_SQL,
    STOPWORDS,
    TOKENS_SQL,
    _BPE_SQL_PAT,
    mg_ngram_col,
    tokens_col,
)
from near_public_lakehouse_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# self_dedup_clean: within-document repeated-window removal

SELF_DEDUP_W = 3  # phrase width in tokens

# A window (token run of width W) is a duplicate iff the same W tokens
# appeared earlier in the SAME document; every token covered by a
# duplicate window is removed and the document is rebuilt from the
# survivors (canonical single-space join — the same token-sequence
# round-trip contract as substring_dedup_clean). First occurrences always
# survive, so cleaning is idempotent: cleaning a cleaned doc removes 0.


def self_dedup_frame(docs: DataFrame) -> DataFrame:
    """Frame-level transform seam (doc_id, text) -> cleaned columns, so
    property tests can feed constructed documents. All steps are per-row
    array HOFs. Duplicate-window detection sorts (window, index) structs
    and flags equal-content neighbors — within a group of identical
    windows the lowest index sorts first, so exactly the non-first
    occurrences are flagged. O(n log n) comparisons per row where the
    naive array_position scan is O(n^2): HOF lambdas evaluate outside
    whole-stage codegen, so the asymptotic term is the wall-clock term
    (measured 7x at sf0.1)."""
    w = SELF_DEDUP_W
    return (
        docs.withColumn("toks", tokens_col())
        .withColumn(
            "wins",
            F.expr(
                f"CASE WHEN size(toks) >= {w} THEN "
                f"transform(sequence(1, size(toks) - {w} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {w}))) "
                "ELSE array() END"
            ),
        )
        .withColumn(
            "srt",
            # guard: Spark's sequence(1, 0) DESCENDS, so empty wins must
            # short-circuit (the repo-wide sequence-empty trap)
            F.expr(
                "CASE WHEN size(wins) = 0 "
                "THEN cast(array() as array<struct<w:string,i:int>>) "
                "ELSE array_sort(transform(sequence(1, size(wins)), "
                "i -> struct(element_at(wins, i) AS w, i AS i))) END"
            ),
        )
        .withColumn(
            "dups",
            F.expr(
                "CASE WHEN size(srt) < 2 THEN cast(array() as array<int>) ELSE "
                "filter(transform(sequence(2, size(srt)), "
                "k -> IF(element_at(srt, k).w = element_at(srt, k - 1).w, "
                "element_at(srt, k).i, cast(null as int))), "
                "x -> x IS NOT NULL) END"
            ),
        )
        .withColumn(
            "kept",
            # `dups` is let-bound as a lambda variable (the repo's
            # transform-over-singleton idiom, see dedup._sig_df): referenced
            # directly inside the per-token lambda, CollapseProject inlines
            # the whole dups-building expression into the `exists` argument,
            # which interpreted HOF evaluation then recomputes for EVERY
            # token j — O(tokens x windows) per row instead of O(tokens).
            # Measured at sf0.1 (r15 optimization round, guide §1/§4): the
            # inlined plan spends 7.9 task-seconds on 0.01 MB of input; the
            # let-bound plan evaluates dups once per row.
            F.expr(
                "CASE WHEN size(toks) = 0 THEN array() ELSE "
                "element_at(transform(array(dups), d -> "
                "filter(sequence(1, size(toks)), "
                f"j -> NOT exists(d, s -> j >= s AND j <= s + {w} - 1))), 1) END"
            ),
        )
        .select(
            "doc_id",
            F.expr("size(toks)").alias("n_tokens"),
            F.expr("size(toks) - size(kept)").alias("removed_toks"),
            # nullif: concat_ws never returns NULL, but the oracle's
            # array_to_string over an empty (or NULL-text) kept list is
            # NULL — and tokens are non-empty strings, so '' can only
            # mean "nothing survived" (r15 differential fuzz finding).
            F.expr(
                "nullif(concat_ws(' ', transform(kept, j -> element_at(toks, j))), '')"
            ).alias("cleaned_text"),
        )
    )


_SELF_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
w AS (SELECT doc_id, toks,
        CASE WHEN len(toks) >= {SELF_DEDUP_W}
             THEN list_transform(range(1, len(toks) - {SELF_DEDUP_W} + 2),
                    i -> array_to_string(toks[i:i+{SELF_DEDUP_W - 1}], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS wins FROM t),
d AS (SELECT doc_id, toks,
        list_filter(range(1, len(wins) + 1),
          i -> list_position(wins, wins[i]) < i) AS dups
      FROM w),
k AS (SELECT doc_id, toks, dups,
        list_filter(range(1, len(toks) + 1),
          j -> len(list_filter(dups,
                 s -> j >= s AND j <= s + {SELF_DEDUP_W} - 1)) = 0) AS kept
      FROM d)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(toks) - len(kept) AS removed_toks,
       array_to_string(list_transform(kept, j -> toks[j]), ' ') AS cleaned_text
FROM k
ORDER BY doc_id
"""


@query(
    "self_dedup_clean",
    tags=("text", "dedup", "llm-pipeline"),
    oracle=_SELF_DEDUP_ORACLE,
    bench=True,
)
def self_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-window removal (intra-doc half of Lee et
    al. substring dedup): any {W}-token run whose exact content appeared
    earlier in the same document is cut, and the document is rebuilt from
    the surviving tokens. Zero shuffles — unlike the cross-doc transform
    there is no corpus-wide window index to build, so this runs as a
    narrow map over the scan and composes with any downstream operator
    for free. At 100 TB: per-row cost depends only on document length,
    never corpus size.

    The deterministic output order is produced by sorting the INPUT
    (doc_id, text) and mapping over it — a final orderBy would make the
    range partitioner's sampling pass evaluate the expensive HOF
    projection twice (measured 2.5x at sf0.1); the per-row transform is
    narrow, so the input's range order carries through.

    The range exchange carries an EXPLICIT partition count
    (defaultParallelism, cluster-derived — not a constant): with a bare
    orderBy, AQE's byte-based coalescing sees ~20 MB of (doc_id, text)
    and folds the stage to ~5 partitions, blind to the per-row HOF CPU
    that dominates this operator (guide §2.5's "synthetic partitioning"
    cousin: the cost lives in compute, not bytes — measured 5 tasks /
    7.9 task-s at sf0.1 before, full-width after). An explicit count on
    repartitionByRange is exempt from AQE coalescing, and
    sortWithinPartitions keeps the same global doc_id order the plain
    orderBy produced."""
    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    return self_dedup_frame(
        docs.select("doc_id", "text")
        .repartitionByRange(n_part, "doc_id")
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# shard_manifest: deterministic seeded hash-sharding + manifest

N_SHARDS = 16
SHARD_SEED = "r6"  # versioned placement: new seed = full deterministic reshuffle


def shard_col(seed: str = SHARD_SEED, n_shards: int = N_SHARDS):
    """Deterministic shard id from a seeded md5 of the doc id. Hash
    placement (vs range/ntile) needs no global sort, is stable under any
    row order or partitioning, and balances shards to within sampling
    noise. The seed versions the placement: re-sharding for a new
    training run is a seed bump, not a data rewrite."""
    return (
        md5_prefix_int(
            F.concat_ws(":", F.lit(seed), F.col("doc_id").cast("string"))
        )
        % n_shards
    )


_SHARD_SQL = (
    f"('0x' || substr(md5('{SHARD_SEED}' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {N_SHARDS}"
)


@query(
    "shard_manifest",
    tags=("sampling", "llm-pipeline"),
    oracle=f"""
SELECT {_SHARD_SQL} AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({TOKENS_SQL})) AS BIGINT) AS total_tokens,
       CAST(sum(len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PAT}'),
                                m -> trim(m) <> ''))) AS BIGINT) AS total_bpe_tokens,
       count(DISTINCT source) AS n_sources,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
ORDER BY shard_id
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment and the per-shard manifest
    a dataloader consumes: doc count, token budget under both tokenizers,
    source spread, id fences. One groupBy on the seeded hash — map-side
    partials reduce the shuffle to {n_shards} rows regardless of corpus
    size, and shard skew is bounded by hash uniformity (no hot-key
    regime exists). The write side is `df.write.partitionBy(shard_id)`
    with this manifest as the sidecar."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens_col()
    bpe = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0),
        lambda m: F.trim(m) != "",
    )
    return (
        docs.select(
            shard_col().alias("shard_id"),
            F.size(ws).alias("n_ws"),
            F.size(bpe).alias("n_bpe"),
            "source",
            "doc_id",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# source_data_card: the per-source corpus report

_QF_FAIL_SQL = f"""(
  len({TOKENS_SQL}) < {QF_MIN_TOKENS}
  OR CAST(len(list_distinct({TOKENS_SQL})) AS DOUBLE) / len({TOKENS_SQL}) < {QF_MIN_DISTINCT_RATIO}
  OR CAST(len(list_filter({TOKENS_SQL}, x -> x IN {STOP_SQL})) AS DOUBLE)
       / len({TOKENS_SQL}) > {QF_MAX_STOPWORD_RATIO}
  OR CAST(n_chars AS DOUBLE) / len({TOKENS_SQL}) > {QF_MAX_AVG_WORD_LEN}
)"""


_CARD_ORACLE = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({TOKENS_SQL})) AS BIGINT) AS total_tokens,
       CAST(sum(len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PAT}'),
                                m -> trim(m) <> ''))) AS BIGINT) AS total_bpe_tokens,
       CAST(count(*) - count(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS n_exact_dup_docs,
       CAST(sum(CASE WHEN {_QF_FAIL_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_fail,
       avg(least(1.0, len({TOKENS_SQL}) / 64.0) * 0.4
           + (CAST(len(list_distinct({TOKENS_SQL})) AS DOUBLE) / len({TOKENS_SQL})) * 0.4
           + (1.0 - CAST(len(list_filter({TOKENS_SQL}, x -> x IN {STOP_SQL})) AS DOUBLE)
                    / len({TOKENS_SQL})) * 0.2) AS mean_quality
FROM documents
GROUP BY source
ORDER BY source
"""


def card_row_metrics(docs: DataFrame) -> DataFrame:
    """Per-row data-card metric projection
    (source, n_ws, n_bpe, fingerprint, qfail, q) — the shared seam
    between the batch `source_data_card` aggregation and the streaming
    twin's per-batch partial indexes (`streaming/jobs.py`), so the two
    can never disagree on what a metric means."""
    toks = tokens_col()
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    nstop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    bpe = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0),
        lambda m: F.trim(m) != "",
    )
    fails = (
        (n < QF_MIN_TOKENS)
        | (nd.cast("double") / n < QF_MIN_DISTINCT_RATIO)
        | (nstop.cast("double") / n > QF_MAX_STOPWORD_RATIO)
        | (F.col("n_chars").cast("double") / n > QF_MAX_AVG_WORD_LEN)
    )
    quality = (
        F.least(F.lit(1.0), n / F.lit(64.0)) * 0.4
        + (nd.cast("double") / n) * 0.4
        + (F.lit(1.0) - nstop.cast("double") / n) * 0.2
    )
    return docs.select(
        "source",
        n.alias("n_ws"),
        F.size(bpe).alias("n_bpe"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.when(fails, 1).otherwise(0).alias("qfail"),
        quality.alias("q"),
    )


@query(
    "source_data_card",
    tags=("text", "llm-pipeline", "reporting"),
    oracle=_CARD_ORACLE,
)
def source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card: volume, token budgets under both tokenizers,
    exact-duplicate count (docs minus distinct fingerprints), quality-gate
    failure count (same four rules as `quality_filter`), and mean quality
    score — the one-row-per-source report a curation team publishes with
    every corpus release. Single two-level aggregation: every metric is a
    per-row expression combined with map-side partials, so the shuffle
    carries |sources| rows; count(DISTINCT fingerprint) expands to the
    standard two-phase distinct aggregate, still keyed on source.
    Streaming twin: `streaming/jobs.streaming_source_data_card`."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        card_row_metrics(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            (F.count(F.lit(1)) - F.countDistinct("fingerprint")).alias(
                "n_exact_dup_docs"
            ),
            F.sum("qfail").alias("n_quality_fail"),
            F.avg("q").alias("mean_quality"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# perplexity_buckets: corpus composition by unigram-LM quality band

# ONE canonical alpha (r14 review: two independent constants whose only
# sync was a comment) — imported from the scorer that defines the model.
from near_public_lakehouse_spark.queries.corpus_stats import LM_ALPHA  # noqa: E402


@query(
    "perplexity_buckets",
    tags=("text", "llm-pipeline", "quality"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS vocab
  FROM freq
),
doc AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         avg(ln((CAST(cnt AS DOUBLE) + {LM_ALPHA}) / (n_total + {LM_ALPHA} * vocab)))
           AS avg_logprob
  FROM tok JOIN freq USING (token) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT CAST(floor(avg_logprob) AS BIGINT) AS logprob_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       avg(avg_logprob) AS mean_logprob
FROM doc
GROUP BY 1
ORDER BY logprob_bucket
""",
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by unigram-LM fluency band: how many documents
    and training tokens sit in each ln-width bucket of mean token
    log-probability — the CCNet-style head/middle/tail report as absolute
    bands. Fixed bucket edges (floor of the mean logprob) instead of
    quantiles keep membership engine-exact and avoid the global sort an
    ntile split would need; downstream mixture sampling selects by bucket
    id. Plan: the `unigram_logprob_scores` pipeline (explode -> frequency
    shuffle -> token join with 1-row broadcast total -> doc re-agg) plus
    one |buckets|-row final aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # the shared scorer, not an inline copy (r14 review: three copies of
    # the add-alpha logp formula existed; same aggregates, same order)
    doc = unigram_scores_against(tok, freq, with_n_tokens=True)
    return (
        doc.select(
            F.floor(F.col("avg_logprob")).cast("bigint").alias("logprob_bucket"),
            "n_tokens",
            "avg_logprob",
        )
        .groupBy("logprob_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("avg_logprob").alias("mean_logprob"),
        )
        .orderBy("logprob_bucket")
    )


# ---------------------------------------------------------------------------
# quality_mixture_sample: perplexity-banded deterministic downsampling

QMS_KEEP_MIDDLE = 500  # per-mille keep rate for the middle band
QMS_KEEP_TAIL = 100  # per-mille keep rate for the tail band
QMS_TAIL_LN = 1.0  # tail = more than 1 ln below the corpus mean
QMS_SEED = "qms"

_QMS_HASH = f"('0x' || substr(md5('{QMS_SEED}' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000"


_QMS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS vocab
  FROM freq
),
doc AS (
  SELECT doc_id,
         avg(ln((CAST(cnt AS DOUBLE) + {LM_ALPHA}) / (n_total + {LM_ALPHA} * vocab)))
           AS avg_logprob
  FROM tok JOIN freq USING (token) CROSS JOIN tot
  GROUP BY doc_id
),
m AS (SELECT avg(avg_logprob) AS mu FROM doc),
banded AS (
  SELECT doc_id, avg_logprob,
         CASE WHEN avg_logprob >= mu THEN 'head'
              WHEN avg_logprob >= mu - {QMS_TAIL_LN} THEN 'middle'
              ELSE 'tail' END AS band
  FROM doc CROSS JOIN m
)
SELECT doc_id, avg_logprob, band
FROM banded
WHERE CASE band WHEN 'head' THEN 1000
                WHEN 'middle' THEN {QMS_KEEP_MIDDLE}
                ELSE {QMS_KEEP_TAIL} END > {_QMS_HASH}
ORDER BY doc_id
"""


def unigram_scores_against(
    tok: DataFrame, freq: DataFrame, with_n_tokens: bool = False
) -> DataFrame:
    """(doc_id, avg_logprob): mean add-alpha unigram log-probability of
    each document's tokens under the GIVEN frequency table — the shared
    scoring seam between the batch sampler (freq from the same corpus)
    and the streaming twin (freq from the maintained corpus-so-far
    index), so the two can never diverge on what a score means."""
    tot = freq.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    logp = F.log(
        (F.col("cnt").cast("double") + F.lit(LM_ALPHA))
        / (F.col("n_total") + F.lit(LM_ALPHA) * F.col("vocab"))
    )
    aggs = [F.avg(logp).alias("avg_logprob")]
    if with_n_tokens:
        aggs.insert(0, F.count(F.lit(1)).alias("n_tokens"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(*aggs)
    )


def mixture_keep(doc: DataFrame, mu: DataFrame) -> DataFrame:
    """Band (head/middle/tail vs the given 1-row mean) + seeded-hash keep
    decision over a (doc_id, avg_logprob) frame — shared by the batch
    sampler and the streaming twin."""
    band = (
        F.when(F.col("avg_logprob") >= F.col("mu"), "head")
        .when(F.col("avg_logprob") >= F.col("mu") - QMS_TAIL_LN, "middle")
        .otherwise("tail")
    )
    keep_mille = (
        F.when(F.col("band") == "head", 1000)
        .when(F.col("band") == "middle", QMS_KEEP_MIDDLE)
        .otherwise(QMS_KEEP_TAIL)
    )
    bucket = (
        md5_prefix_int(
            F.concat_ws(":", F.lit(QMS_SEED), F.col("doc_id").cast("string"))
        )
        % 1000
    )
    return (
        doc.crossJoin(F.broadcast(mu))
        .select("doc_id", "avg_logprob", band.alias("band"))
        .filter(keep_mille > bucket)
    )


@query(
    "quality_mixture_sample",
    tags=("text", "llm-pipeline", "quality", "sampling"),
    oracle=_QMS_ORACLE,
)
def quality_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality-banded downsampling, fully deterministic: each
    document's unigram-LM mean log-probability places it in the head
    (above the corpus mean — kept whole), middle (within 1 ln below —
    kept at 50%), or tail (further below — kept at 10%), and the keep
    decision is a seeded hash of the doc id, not an RNG — so the sample
    is reproducible under any partitioning, re-run, or engine, and
    incremental batches sample consistently. The corpus mean is a 1-row
    broadcast; everything else reuses the unigram pipeline's shuffles.
    A training run swaps the per-mille constants for its mixture
    weights; the seed versions the sample like `shard_manifest`'s.
    Streaming twin: `streaming/jobs.streaming_quality_mixture`."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    doc = unigram_scores_against(tok, freq)
    mu = doc.agg(F.avg("avg_logprob").alias("mu"))
    return mixture_keep(doc, mu).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DSIR: data selection via hashed-n-gram importance resampling scores

DSIR_BUCKETS = 4096  # hashed feature space (Xie et al. 2023 use 10k)
DSIR_TARGET_LANG = "en"  # stand-in target domain on the synthetic corpus

_DSIR_BUCKET_SQL = "('0x' || substr(md5({g}), 1, 8))::BIGINT % " + str(DSIR_BUCKETS)

_DSIR_ORACLE = f"""
WITH t AS (SELECT doc_id, lang, {TOKENS_SQL} AS toks FROM documents),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> {_DSIR_BUCKET_SQL.format(g="toks[i] || ' ' || toks[i + 1]")})) AS b
  FROM t WHERE len(toks) >= 2
),
raw AS (SELECT b, count(*) AS rc FROM bg GROUP BY b),
tgt AS (SELECT b, count(*) AS tc FROM bg WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tots AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_raw,
         CAST(count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS DOUBLE) AS n_tgt
  FROM bg
),
lr AS (
  SELECT raw.b,
         ln((COALESCE(tc, 0) + 1) / (n_tgt + {DSIR_BUCKETS}))
           - ln((rc + 1) / (n_raw + {DSIR_BUCKETS})) AS lr
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots
)
SELECT doc_id,
       count(*) AS n_feats,
       sum(lr) AS log_importance,
       sum(lr) / count(*) AS avg_log_importance
FROM bg JOIN lr USING (b)
GROUP BY doc_id ORDER BY doc_id
"""



@query(
    "sampling_dsir_importance",
    tags=("text", "llm-pipeline", "sampling"),
    oracle=_DSIR_ORACLE,
)
def sampling_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash every bigram into a
    bounded feature space, fit add-1-smoothed bag-of-buckets models for
    the target domain (here: lang='en' docs) and the raw corpus, and
    score each document by its log importance ratio
    sum_b c_b * (ln p_target(b) - ln p_raw(b)). Positive length-normalized
    scores mean "more target-like than the mixture" — the resampling stage
    takes a Gumbel top-k over these scores.

    100 TB design: the feature space is FIXED at 4096 buckets, so both
    model tables are bounded and broadcast regardless of corpus size; the
    md5 bucketing is the repo's cross-engine hash idiom
    (benchmark_decontamination_hashed). Plan: one (bucket) count shuffle
    each for raw/target (map-side combined), a broadcast join of the
    per-bucket log-ratios back onto the feature stream, one doc_id
    re-aggregation. No Python boundary; the transcendental enters per
    bucket (4096 rows), not per token."""
    docs = load_table(spark, sf_dir, "documents")
    bg = dsir_feature_stream(docs)
    raw, tgt, tots = dsir_bucket_models(bg)
    return dsir_doc_scores(bg, dsir_log_ratios(raw, tgt, tots)).orderBy("doc_id")


def dsir_feature_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b): every bigram instance hashed into the bounded
    bucket space. Pure scan-side projection — no shuffle."""
    return (
        docs.filter(F.size(tokens_col()) >= 2)
        # mg_ngram_col(2), not an inline transform (r14 review: the
        # third verbatim copy of the bigram window, re-tokenizing the
        # row per element — O(L^2)/row on the DSIR feature path)
        .select("doc_id", "lang", F.explode(mg_ngram_col(2)).alias("g"))
        .select(
            "doc_id",
            "lang",
            (
                md5_prefix_int(F.col("g")) % DSIR_BUCKETS
            ).alias("b"),
        )
    )


def dsir_bucket_models(bg: DataFrame):
    """Raw- and target-model bucket counts plus totals, each bounded by
    the fixed feature space (broadcastable at any corpus size)."""
    is_tgt = F.col("lang") == DSIR_TARGET_LANG
    raw = bg.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt = bg.filter(is_tgt).groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    tots = bg.agg(
        F.count(F.lit(1)).cast("double").alias("n_raw"),
        F.sum(is_tgt.cast("long")).cast("double").alias("n_tgt"),
    )
    return raw, tgt, tots


def dsir_log_ratios(raw: DataFrame, tgt: DataFrame, tots: DataFrame) -> DataFrame:
    """(b, lr): add-1-smoothed per-bucket log importance ratios."""
    return (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                    / (F.col("n_tgt") + DSIR_BUCKETS)
                )
                - F.log((F.col("rc") + 1) / (F.col("n_raw") + DSIR_BUCKETS))
            ).alias("lr"),
        )
    )


def dsir_doc_scores(bg: DataFrame, lr: DataFrame) -> DataFrame:
    """Per-document importance: broadcast the bounded log-ratio table onto
    the feature stream, one doc_id re-aggregation."""
    return (
        bg.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("log_importance"),
            (F.sum("lr") / F.count(F.lit(1))).alias("avg_log_importance"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR resampling: deterministic Gumbel top-k over the importance scores

DSIR_TOPK_K = 100
DSIR_SEED = "dsir-r6"  # versions the sample, like shard_manifest's seed

# seeded uniform in (0,1): md5 of the doc id, 8 hex chars -> [0, 1e6) + 0.5
_DSIR_U_SQL = (
    f"((('0x' || substr(md5('{DSIR_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " % 1000000) + 0.5) / 1000000.0"
)

_DSIR_TOPK_ORACLE = f"""
WITH t AS (SELECT doc_id, lang, {TOKENS_SQL} AS toks FROM documents),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> {_DSIR_BUCKET_SQL.format(g="toks[i] || ' ' || toks[i + 1]")})) AS b
  FROM t WHERE len(toks) >= 2
),
raw AS (SELECT b, count(*) AS rc FROM bg GROUP BY b),
tgt AS (SELECT b, count(*) AS tc FROM bg WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tots AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_raw,
         CAST(count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS DOUBLE) AS n_tgt
  FROM bg
),
lr AS (
  SELECT raw.b,
         ln((COALESCE(tc, 0) + 1) / (n_tgt + {DSIR_BUCKETS}))
           - ln((rc + 1) / (n_raw + {DSIR_BUCKETS})) AS lr
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots
),
scored AS (
  SELECT doc_id, sum(lr) AS log_importance
  FROM bg JOIN lr USING (b) GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, log_importance,
         log_importance - ln(-ln({_DSIR_U_SQL})) AS gumbel_key
  FROM scored
)
SELECT doc_id, log_importance, gumbel_key,
       CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id) AS BIGINT) AS rnk
FROM keyed
QUALIFY rnk <= {DSIR_TOPK_K}
ORDER BY rnk
"""


@query(
    "sampling_dsir_topk",
    tags=("text", "llm-pipeline", "sampling"),
    oracle=_DSIR_TOPK_ORACLE,
)
def sampling_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling stage of DSIR: draw K documents WITHOUT replacement
    with probability proportional to importance, via the Gumbel-max trick
    — key = log_importance + Gumbel(0,1), take the top K keys. The Gumbel
    noise is a SEEDED HASH of the doc id (-ln(-ln(u)), u = md5-derived
    uniform), not an RNG, so the drawn sample is identical under any
    partitioning, engine, or re-run, and incremental batches draw
    consistently — the same determinism discipline as
    quality_mixture_sample and shard_manifest.

    Plan: everything up to the per-doc score is sampling_dsir_importance's
    broadcast pipeline; the top-K is orderBy().limit(K), which Catalyst
    compiles to TakeOrderedAndProject — per-partition top-K heaps then a
    K*P merge — so no global sort ever materializes. Only the K survivors
    see a window (for the rank column), and K*P stays tiny for K=100 at
    any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bg = dsir_feature_stream(docs)
    raw, tgt, tots = dsir_bucket_models(bg)
    scored = dsir_doc_scores(bg, dsir_log_ratios(raw, tgt, tots))
    u = (
        (
            md5_prefix_int(
                F.concat(F.lit(f"{DSIR_SEED}:"), F.col("doc_id").cast("string"))
            )
            % 1000000
        ).cast("double")
        + 0.5
    ) / 1000000.0
    keyed = scored.select(
        "doc_id",
        "log_importance",
        (F.col("log_importance") - F.log(-F.log(u))).alias("gumbel_key"),
    )
    topk = keyed.orderBy(F.col("gumbel_key").desc(), "doc_id").limit(DSIR_TOPK_K)
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col("doc_id"))
    return (
        topk.withColumn("rnk", F.row_number().over(w).cast("bigint")).orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# mixture re-balancing: temperature-based per-source sampling rates

MIX_TEMP_ALPHA = 0.5  # temperature exponent; 0.5 == sqrt re-weighting


@query(
    "mixture_rebalance_plan",
    tags=("text", "llm-pipeline", "sampling"),
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({TOKENS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM s),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / total AS current_share,
         sqrt(CAST(n_tokens AS DOUBLE) / total) AS raw_w
  FROM s CROSS JOIN t
),
z AS (SELECT CAST(sum(raw_w) AS DOUBLE) AS zsum FROM w)
SELECT source, n_docs, n_tokens, current_share,
       raw_w / zsum AS target_share,
       raw_w / zsum * total AS target_tokens,
       (raw_w / zsum * total) / n_tokens AS rate,
       CASE WHEN (raw_w / zsum * total) / n_tokens <= 1.0
            THEN 'downsample' ELSE 'upsample' END AS mode
FROM w CROSS JOIN z CROSS JOIN t
ORDER BY source
""",
)
def mixture_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture re-weighting plan a curation pipeline derives before
    resampling: per-source token shares are re-balanced by temperature
    sampling (share^alpha renormalized, alpha={MIX_TEMP_ALPHA} — the
    multilingual-corpus standard of Conneau & Lample 2019), and each
    source gets its sampling `rate` = target_tokens / current_tokens,
    labeled downsample (feed `quality_mixture_sample`-style seeded-hash
    keeps) or upsample (feed `mixture_upsample`'s copy counts). Paired
    with `source_token_kl_drift`, this closes the monitor -> plan ->
    resample loop.

    Scale shape: one |sources|-row aggregation off the scan; the two
    scalar totals come back as 1-row broadcasts (J8 pattern). sqrt, not
    pow, so the transcendental is the same primitive on both engines.
    All doubles derive from exact BIGINT sums — order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens"),
    )
    t = s.agg(F.sum("n_tokens").cast("double").alias("total"))
    w = s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total")).alias("current_share"),
        F.sqrt(F.col("n_tokens").cast("double") / F.col("total")).alias("raw_w"),
        "total",
    )
    z = w.agg(F.sum("raw_w").cast("double").alias("zsum"))
    target_tokens = F.col("raw_w") / F.col("zsum") * F.col("total")
    rate = target_tokens / F.col("n_tokens")
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "current_share",
            (F.col("raw_w") / F.col("zsum")).alias("target_share"),
            target_tokens.alias("target_tokens"),
            rate.alias("rate"),
            F.when(rate <= 1.0, "downsample").otherwise("upsample").alias("mode"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# training-sequence packing (concat-and-chunk)

PACK_SEQ_LEN = 256

_PACK_CONTRIB_SQL = f"""
t AS (SELECT doc_id, len({TOKENS_SQL}) AS n_tok FROM documents),
c AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
  FROM t
),
spans AS (SELECT * FROM c WHERE n_tok > 0),
contrib AS (
  SELECT doc_id, start, n_tok,
         unnest(range(start // {PACK_SEQ_LEN},
                      (start + n_tok - 1) // {PACK_SEQ_LEN} + 1)) AS seq_id
  FROM spans
),
packed AS (
  SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
         CAST(least(start + n_tok, (seq_id + 1) * {PACK_SEQ_LEN})
              - greatest(start, seq_id * {PACK_SEQ_LEN}) AS BIGINT) AS n_tokens
  FROM contrib
)"""


def _packing_frame(docs: DataFrame) -> DataFrame:
    """(seq_id, doc_id, n_tokens): GPT-style concat-and-chunk packing —
    documents concatenate in doc_id order into one global token stream
    cut every PACK_SEQ_LEN tokens; each row is one document's token
    contribution to one training sequence. Doc offsets come from the
    two-pass distributed cumsum (range-partition + local window +
    broadcast partition totals) — NEVER a single-partition global
    window; the per-doc seq range explode is a bounded F.sequence
    (1 + n_tok/SEQ_LEN elements)."""
    from near_public_lakehouse_spark.queries.suffix import (
        distributed_exclusive_cumsum,
    )

    lens = docs.select("doc_id", F.size(tokens_col()).cast("bigint").alias("n_tok"))
    spans = distributed_exclusive_cumsum(lens, ["doc_id"], "n_tok", out="start").filter(
        F.col("n_tok") > 0
    )
    return contrib_from_spans(spans)


def contrib_from_spans(spans: DataFrame) -> DataFrame:
    """(seq_id, doc_id, n_tokens) from (doc_id, start, n_tok) document
    spans over the global token stream — the chunk-intersection step of
    the packing, shared by the batch query and the streaming fold
    (`streaming/jobs.packing_from_state`, which derives `start` from
    within-batch cumsums plus cross-batch offsets instead)."""
    L = PACK_SEQ_LEN
    first = F.expr(f"CAST(start DIV {L} AS BIGINT)")
    last = F.expr(f"CAST((start + n_tok - 1) DIV {L} AS BIGINT)")
    contrib = spans.select(
        "doc_id", "start", "n_tok", F.explode(F.sequence(first, last)).alias("seq_id")
    )
    lo = F.greatest(F.col("start"), F.col("seq_id") * L)
    hi = F.least(F.col("start") + F.col("n_tok"), (F.col("seq_id") + 1) * L)
    return contrib.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        (hi - lo).cast("bigint").alias("n_tokens"),
    )


@query(
    "training_sequence_packing",
    tags=("text", "llm-pipeline", "packing"),
    oracle=f"""
WITH {_PACK_CONTRIB_SQL}
SELECT seq_id, doc_id, n_tokens FROM packed
ORDER BY seq_id, doc_id
""",
)
def training_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk training-sequence packing (the GPT-style
    pretraining batcher): the corpus token stream in doc_id order is cut
    into fixed {PACK_SEQ_LEN}-token sequences; output maps every
    (sequence, document) overlap with its token contribution — what a
    dataloader needs to slice documents into batches without
    materializing the token stream itself. Exact-integer everywhere, so
    the cross-engine check is hash-exact. Beyond-reference LLM-pipeline
    surface (assignment brief)."""
    docs = load_table(spark, sf_dir, "documents")
    return _packing_frame(docs).orderBy("seq_id", "doc_id")


@query(
    "training_packing_stats",
    tags=("text", "llm-pipeline", "packing"),
    oracle=f"""
WITH {_PACK_CONTRIB_SQL}
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       sum(n_tokens) = {PACK_SEQ_LEN} AS is_full
FROM packed
GROUP BY seq_id
ORDER BY seq_id
""",
)
def training_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence packing rollup: document count, token fill, fullness.
    Invariant (pinned in tests): every sequence except possibly the last
    is exactly full — the packing loses no tokens and pads nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _packing_frame(docs)
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            (F.sum("n_tokens") == PACK_SEQ_LEN).alias("is_full"),
        )
        .orderBy("seq_id")
    )
