"""Text-analysis queries over the `documents` table — the LLM-data-pipeline
surface (BASELINE.json north star): tokenization, quality scoring,
language-ID heuristic, fingerprinting. All computed with JVM-side built-ins
and higher-order functions — zero Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.numeric import md5_prefix_int

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table

# One tokenizer, used by every text query on both engines.
TOKENS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"  # DuckDB


def tokens_col():  # Spark
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


STOPWORDS = ("the", "a", "of", "an", "to", "and", "in")
STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


@query(
    "token_counts",
    tags=("text", "G1"),
    oracle=f"""
SELECT doc_id,
       len({TOKENS_SQL}) AS n_tokens,
       len(list_distinct({TOKENS_SQL})) AS n_distinct_tokens,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document — no explode, no shuffle:
    array HOFs keep it a narrow map over the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        "n_chars",
    ).orderBy("doc_id")


# BPE-ish pre-tokenizer: GPT-2-style contraction / space-prefixed word /
# number / punctuation-run alternation, restricted to constructs whose
# semantics are IDENTICAL under Java regex (Spark) and RE2 (DuckDB) — no
# lookarounds (RE2 has none), and every alternation is start-disjoint or
# longest-first so leftmost-first and leftmost-longest matching agree.
# Counting these matches approximates subword token counts (each match is
# a merge-seed) far better than whitespace words on punctuation- or
# number-heavy text — the ratio column is the standard budget estimator a
# curation pipeline uses before paying for real BPE.
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|'+|\s+"
_BPE_SQL_PAT = BPE_PAT.replace("'", "''")


@query(
    "token_counts_bpe",
    tags=("text", "tokenizer"),
    oracle=f"""
SELECT doc_id,
       len({TOKENS_SQL}) AS n_ws_tokens,
       len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PAT}'), m -> trim(m) <> ''))
         AS n_bpe_tokens,
       len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PAT}'), m -> trim(m) <> ''))::DOUBLE
         / greatest(len({TOKENS_SQL}), 1) AS bpe_per_word
FROM documents
ORDER BY doc_id
""",
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation with a BPE-ish regex pre-tokenizer
    (GPT-2-style contraction/word/number/punct alternation) next to the
    whitespace count, plus their ratio — per-row regexp inside codegen,
    no explode, no shuffle, no Python; cross-engine parity of the
    pattern is pinned in tests/test_text_extra.py."""
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens_col()
    bpe = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0),
        lambda m: F.trim(m) != "",
    )
    n_ws = F.size(ws)
    n_bpe = F.size(bpe)
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (n_bpe.cast("double") / F.greatest(n_ws, F.lit(1))).alias("bpe_per_word"),
    ).orderBy("doc_id")


@query(
    "word_frequencies",
    tags=("text", "G1", "G2"),
    oracle=f"""
SELECT word, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS word FROM documents)
GROUP BY word
ORDER BY n_occurrences DESC, word
LIMIT 50
""",
)
def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies: explode (G1) + grouped count — the
    `posexplode`-then-aggregate shape used all over the silver layer
    (Silver Lake Mainnet.sql:88,135,196,...)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens_col()).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(50)
    )


@query(
    "quality_scores",
    tags=("text",),
    oracle=f"""
SELECT doc_id,
       n_tokens,
       distinct_ratio,
       stopword_ratio,
       least(1.0, n_tokens / 64.0) * 0.4 + distinct_ratio * 0.4
         + (1.0 - stopword_ratio) * 0.2 AS quality_score
FROM (
  SELECT doc_id,
         len({TOKENS_SQL}) AS n_tokens,
         len(list_distinct({TOKENS_SQL})) / len({TOKENS_SQL}) AS distinct_ratio,
         len(list_filter({TOKENS_SQL}, x -> x IN {STOP_SQL}))
           / len({TOKENS_SQL}) AS stopword_ratio
  FROM documents
)
ORDER BY doc_id
""",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring from length / lexical-diversity / stopword
    ratios — the heuristic-prefilter stage of an LLM data pipeline. Pure
    column arithmetic; identical IEEE expression tree on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / n
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            distinct_ratio.alias("distinct_ratio"),
            stop_ratio.alias("stopword_ratio"),
            (
                F.least(F.lit(1.0), F.size(toks) / F.lit(64.0)) * 0.4
                + distinct_ratio * 0.4
                + (F.lit(1.0) - stop_ratio) * 0.2
            ).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


# Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "die", "und"),
    "zh": ("de", "shi", "le"),
}


def _marker_sql(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter({TOKENS_SQL}, x -> x IN ({inlist})))"


def predicted_lang_col():
    """The marker-ladder prediction as a reusable column (shared by
    language_id and the per-source confusion audit)."""
    toks = tokens_col()

    def score(lang: str):
        return F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS[lang])))

    en, fr, es, de, zh = (score(lang) for lang in ("en", "fr", "es", "de", "zh"))
    return (
        F.when((en >= F.greatest(fr, es, de, zh)) & (en > 0), "en")
        .when((fr >= F.greatest(es, de, zh)) & (fr > 0), "fr")
        .when((es >= F.greatest(de, zh)) & (es > 0), "es")
        .when((de >= zh) & (de > 0), "de")
        .when(zh > 0, "zh")
        .otherwise("und")
    )


# ONE copy of the marker-ladder CASE (r14 review: language_id's oracle
# carried a verbatim second copy that had to be edited in lockstep).
_LANG_PRED_SQL = f"""
CASE
  WHEN {_marker_sql("en")} >= greatest({_marker_sql("fr")}, {_marker_sql("es")},
       {_marker_sql("de")}, {_marker_sql("zh")}) AND {_marker_sql("en")} > 0 THEN 'en'
  WHEN {_marker_sql("fr")} >= greatest({_marker_sql("es")}, {_marker_sql("de")},
       {_marker_sql("zh")}) AND {_marker_sql("fr")} > 0 THEN 'fr'
  WHEN {_marker_sql("es")} >= greatest({_marker_sql("de")}, {_marker_sql("zh")})
       AND {_marker_sql("es")} > 0 THEN 'es'
  WHEN {_marker_sql("de")} >= {_marker_sql("zh")} AND {_marker_sql("de")} > 0 THEN 'de'
  WHEN {_marker_sql("zh")} > 0 THEN 'zh'
  ELSE 'und'
END
"""


@query(
    "language_id",
    tags=("text",),
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, {_LANG_PRED_SQL} AS predicted_lang
FROM documents
ORDER BY doc_id
""",
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification (deterministic priority
    CASE ladder — the action-kind dispatch shape of Silver Lake
    Mainnet.sql:213-242). A real deployment swaps the marker table for
    char-n-gram profiles; the operator shape (per-row array HOF scoring,
    no shuffle) is the point."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted_lang_col().alias("predicted_lang"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    tags=("text", "dedup"),
    oracle="""
SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
       md5(array_to_string(list_filter(string_split(lower(trim(text)), ' '),
                                       x -> x <> ''), ' ')) AS shingle_fingerprint
FROM documents
ORDER BY doc_id
""",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: raw-text hash + whitespace-normalized hash
    (the canonicalize-then-hash step every exact-dedup pipeline starts
    with). md5 is the cross-engine-stable choice; xxhash64 is the faster
    Spark-only alternative for production."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    norm_tokens = F.filter(F.split(norm, " "), lambda x: x != "")
    # Zero-token docs get a NULL shingle fingerprint, not md5('') — the
    # oracle's array_to_string([]) is NULL, and a shared empty-content
    # hash would bucket every empty doc into one dedup cluster (the same
    # class as the r14 LSH NULL-guard; r15 differential fuzz finding).
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.when(
            F.size(norm_tokens) > 0, F.md5(F.array_join(norm_tokens, " "))
        ).alias("shingle_fingerprint"),
    ).orderBy("doc_id")


@query(
    "tfidf_weights",
    tags=("text", "tfidf"),
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({TOKENS_SQL}) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf_count FROM toks GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, word, tf_count, df,
       CAST(tf_count AS DOUBLE) * n_docs / df AS tfidf_rational
FROM tf JOIN df USING (word), n
ORDER BY doc_id, word
""",
)
def tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting, rational-idf variant (tf * N/df): log-free on
    purpose — +,*,/ are IEEE-exact so both engines produce bit-identical
    doubles, where ln() could differ by a ulp between libm and the JVM.
    Per-document ranking of terms is preserved (N/df is monotone in 1/df).

    Scale notes: two shuffles (tf on (doc,word), df on word) + a broadcast
    of the word->df side if small, else a co-partitioned join on word; the
    corpus size N is a 1-row broadcast (J8 pattern), never a driver round
    trip inside the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf_count"))
    df = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf_count",
            "df",
            (F.col("tf_count").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "tfidf_rational"
            ),
        )
        .orderBy("doc_id", "word")
    )


@query(
    "doc_repetition_stats",
    tags=("text", "quality"),
    oracle=f"""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM (SELECT doc_id, {TOKENS_SQL} AS t FROM documents)
),
cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(max(c) AS BIGINT) AS top_bigram_n,
       count(*) AS n_distinct_bigrams,
       CAST(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS DOUBLE)
         AS top_bigram_share,
       CAST(CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS DOUBLE)
         AS dup_bigram_share
FROM cnt GROUP BY doc_id ORDER BY doc_id
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: most-common
    bigram share and duplicate-bigram share (word-level — the synthetic
    docs have no line structure; on real corpora add the same shape over
    split(text, '\\n') lines).

    Scale notes: bigrams are built with array HOFs in the scan projection
    (no self-join), then ONE shuffle on (doc_id, bigram) whose result
    collapses immediately to per-doc scalars — state is bounded by a doc's
    distinct-bigram count, never the corpus. The repeated-doc-id
    partitioning also matches doc_id-keyed downstream filters.
    """
    docs = load_table(spark, sf_dir, "documents")
    # mg_ngram_col(2), not an inline transform (r14 review): the inline
    # form re-tokenized the row inside the lambda (O(L^2)/row, the exact
    # HOF-CSE trap the gopher gate's docstring documents) AND crashed on
    # <2-token docs — sequence(1, 0) DESCENDS in Spark ([1, 0]), so
    # element_at(toks, 0) raises INVALID_INDEX_OF_ZERO even with ANSI
    # off, where the oracle's generate_series(1,0) is simply empty. The
    # shared window column carries the size guard.
    bigrams = mg_ngram_col(2)
    cnt = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_bigram_n",
            "n_distinct_bigrams",
            (F.col("top_bigram_n").cast("double") / F.col("n_bigrams").cast("double"))
            .cast("double")
            .alias("top_bigram_share"),
            (
                (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
                / F.col("n_bigrams").cast("double")
            )
            .cast("double")
            .alias("dup_bigram_share"),
        )
        .orderBy("doc_id")
    )


NGRAM_N = 3  # synthetic vocab is tiny; real decontamination uses 8-13


@query(
    "benchmark_decontamination",
    tags=("text", "dedup", "beyond-reference"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
ng AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - {NGRAM_N - 1}),
                                      i -> array_to_string(t[i:i + {NGRAM_N - 1}], ' ')))
           AS ngs
  FROM toks
),
bench AS (SELECT DISTINCT unnest(ngs) AS g FROM ng WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM (SELECT doc_id, unnest(ngs) AS g FROM ng WHERE doc_id % 97 <> 0) c
  JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT ng.doc_id,
       len(ngs) AS n_ngrams,
       COALESCE(n_contaminated, 0) AS n_contaminated,
       CAST(CAST(COALESCE(n_contaminated, 0) AS DOUBLE)
            / CAST(len(ngs) AS DOUBLE) AS DOUBLE) AS contamination_share
FROM ng LEFT JOIN hits ON ng.doc_id = hits.doc_id
WHERE ng.doc_id % 97 <> 0
ORDER BY ng.doc_id
""",
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per corpus document, the count and share
    of its distinct token {NGRAM_N}-grams that also appear in the held-out
    benchmark set (docs with ``doc_id % 97 == 0`` stand in for the eval
    suite). Training pipelines drop or scrub documents above a share
    threshold before training.

    Scale notes: the benchmark side is tiny by construction (an eval suite,
    not a corpus), so its distinct n-gram set broadcasts; the corpus side
    explodes per-doc DISTINCT n-grams (bounded by doc length) and
    aggregates back to one row per doc — one broadcast join, one doc_id
    shuffle, zero corpus self-joins. At 100 TB swap the exact string
    n-grams for 64-bit hashes (same plan, 8 bytes a row).
    """
    docs = load_table(spark, sf_dir, "documents")
    with_ngs = doc_ngrams(docs)
    bench = (
        with_ngs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("ngs").alias("g"))
        .distinct()
    )
    corpus = with_ngs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench).orderBy("doc_id")


def doc_ngrams(docs: DataFrame) -> DataFrame:
    """(doc_id, ngs): per-document distinct token NGRAM_N-grams — shared by
    the batch query and the streaming twin (streaming/jobs.py)."""
    toks = tokens_col()
    # NULL text -> NULL ngs (not []): DuckDB's list pipeline
    # NULL-propagates, so n_ngrams/share must read NULL for a NULL doc on
    # both engines (r15 differential fuzz, NULL-text class); a short
    # non-NULL doc still yields the empty array.
    ngs = (
        F.when(
            F.size(toks) >= NGRAM_N,
            F.expr(
                f"array_distinct(transform(sequence(1, size(filter(split(text,' '), x -> x != '')) - {NGRAM_N - 1}),"
                f" i -> array_join(slice(filter(split(text,' '), x -> x != ''), i, {NGRAM_N}), ' ')))"
            ),
        )
        .when(F.col("text").isNotNull(), F.array().cast("array<string>"))
    )
    return docs.select("doc_id", ngs.alias("ngs"))


def decontaminate(corpus: DataFrame, bench: DataFrame) -> DataFrame:
    """Contamination stats for a (doc_id, ngs) corpus frame against a (g)
    benchmark n-gram frame: broadcast join + per-doc re-aggregation. Works
    identically on a batch frame and on a foreachBatch micro-batch (every
    doc's n-grams live in its own row, so batch locality is exact)."""
    hits = (
        corpus.select("doc_id", F.explode("ngs").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        corpus.select("doc_id", F.size("ngs").alias("n_ngrams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            )
            .cast("double")
            .alias("contamination_share"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction

# Conservative, engine-portable patterns (same RE2/Java-regex subset).
EMAIL_PAT = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_PAT = r"\+1-555-[0-9]{4}"


@query(
    "pii_redaction",
    tags=("text", "pii"),
    oracle=f"""
WITH dirty AS (
  SELECT doc_id,
         'contact user' || doc_id || '@example.com or +1-555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS d
  FROM documents
),
red AS (
  SELECT doc_id, d,
         regexp_replace(regexp_replace(d, '{EMAIL_PAT}', '<EMAIL>', 'g'),
                        '{PHONE_PAT}', '<PHONE>', 'g') AS clean
  FROM dirty
)
SELECT doc_id,
       len(regexp_extract_all(d, '{EMAIL_PAT}')) AS n_emails,
       len(regexp_extract_all(d, '{PHONE_PAT}')) AS n_phones,
       len(regexp_extract_all(clean, '{EMAIL_PAT}'))
         + len(regexp_extract_all(clean, '{PHONE_PAT}')) AS residual_pii,
       md5(clean) AS clean_md5
FROM red
ORDER BY doc_id
""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub stage: count and redact email/phone patterns per document.
    The corpus is synthetic word-salad, so a deterministic dirty prefix
    (seeded from doc_id) is concatenated first — both engines build the
    identical input, so the oracle exercises the regex engines on REAL
    matches rather than vacuously passing on clean text.

    Scale notes: narrow per-row map, no shuffle, regexp runs JVM-side
    inside codegen. At 100 TB this is the shape of every scrub pass:
    scan -> regexp_replace chain -> write, embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(dirty, EMAIL_PAT, "<EMAIL>"), PHONE_PAT, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(EMAIL_PAT)).alias("n_emails"),
        F.regexp_count(dirty, F.lit(PHONE_PAT)).alias("n_phones"),
        (
            F.regexp_count(clean, F.lit(EMAIL_PAT)) + F.regexp_count(clean, F.lit(PHONE_PAT))
        ).alias("residual_pii"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus token-length histogram

# Closed integer bucket edges — CASE ladder, no float log2 at the edges.
HIST_EDGES = (16, 32, 64, 128, 256, 512)


def _bucket_case_sql() -> str:
    clauses = " ".join(
        f"WHEN n_tokens < {e} THEN {e}" for e in HIST_EDGES
    )
    return f"CASE {clauses} ELSE {HIST_EDGES[-1] * 2} END"


@query(
    "token_length_histogram",
    tags=("text", "A1"),
    oracle=f"""
WITH t AS (SELECT source, len({TOKENS_SQL}) AS n_tokens, n_chars FROM documents)
SELECT source, {_bucket_case_sql()} AS bucket_lt,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM t
GROUP BY source, bucket_lt
ORDER BY source, bucket_lt
""",
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram with fixed power-of-two bucket
    edges — the corpus-stats dashboard feeding mixture and packing
    decisions. Integer CASE ladder (no float log at bucket edges), one
    partial-aggregated shuffle on (source, bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens_col())
    bucket = None
    for e in HIST_EDGES:
        bucket = F.when(n < e, e) if bucket is None else bucket.when(n < e, e)
    bucket = bucket.otherwise(HIST_EDGES[-1] * 2)
    return (
        docs.select("source", n.alias("n_tokens"), "n_chars", bucket.alias("bucket_lt"))
        .groupBy("source", "bucket_lt")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("source", "bucket_lt")
    )


@query(
    "benchmark_decontamination_hashed",
    tags=("text", "dedup", "beyond-reference"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
ng AS (
  SELECT doc_id,
         list_distinct(list_transform(
             list_transform(generate_series(1, len(t) - {NGRAM_N - 1}),
                            i -> array_to_string(t[i:i + {NGRAM_N - 1}], ' ')),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS ngs
  FROM toks
),
bench AS (SELECT DISTINCT unnest(ngs) AS g FROM ng WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM (SELECT doc_id, unnest(ngs) AS g FROM ng WHERE doc_id % 97 <> 0) c
  JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT ng.doc_id,
       len(ngs) AS n_ngrams,
       COALESCE(n_contaminated, 0) AS n_contaminated,
       CAST(CAST(COALESCE(n_contaminated, 0) AS DOUBLE)
            / CAST(len(ngs) AS DOUBLE) AS DOUBLE) AS contamination_share
FROM ng LEFT JOIN hits ON ng.doc_id = hits.doc_id
WHERE ng.doc_id % 97 <> 0
ORDER BY ng.doc_id
""",
)
def benchmark_decontamination_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """benchmark_decontamination's documented 100 TB knob made real: each
    n-gram is hashed to a 60-bit integer (15 hex chars of md5 — inside
    BIGINT range on both engines) right after generation, so the exploded
    join rows and the broadcast benchmark set carry 8 bytes instead of an
    n-token string. Same plan shape; hash collisions are deterministic and
    identical on both engines, so the oracle stays exact."""
    docs = load_table(spark, sf_dir, "documents")
    with_ngs = doc_ngrams(docs)
    hash_ngs = F.array_distinct(
        F.transform(
            F.col("ngs"),
            lambda g: md5_prefix_int(g, 15),
        )
    )
    hashed = with_ngs.select("doc_id", hash_ngs.alias("ngs"))
    bench = (
        hashed.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("ngs").alias("g"))
        .distinct()
    )
    corpus = hashed.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench).orderBy("doc_id")


# ---------------------------------------------------------------------------
# quality filter with reasons

# (rule name, fires-when) — thresholds tuned so both verdicts occur on the
# synthetic corpus; the rule list, not the constants, is the operator.
QF_MIN_TOKENS = 24
QF_MIN_DISTINCT_RATIO = 0.55
QF_MAX_STOPWORD_RATIO = 0.12
QF_MAX_AVG_WORD_LEN = 5.8


@query(
    "quality_filter",
    tags=("text", "quality"),
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         len({TOKENS_SQL}) AS n_tokens,
         len(list_distinct({TOKENS_SQL})) AS n_distinct,
         len(list_filter({TOKENS_SQL}, x -> x IN {STOP_SQL})) AS n_stop,
         n_chars
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         list_filter([
           CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short' END,
           CASE WHEN CAST(n_distinct AS DOUBLE) / n_tokens < {QF_MIN_DISTINCT_RATIO}
                THEN 'low_diversity' END,
           CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > {QF_MAX_STOPWORD_RATIO}
                THEN 'stopword_heavy' END,
           CASE WHEN CAST(n_chars AS DOUBLE) / n_tokens > {QF_MAX_AVG_WORD_LEN}
                THEN 'long_words' END
         ], x -> x IS NOT NULL) AS reasons
  FROM m
)
SELECT doc_id, n_tokens,
       coalesce(array_to_string(reasons, ','), '') AS reasons,
       len(reasons) = 0 AS passes
FROM r
ORDER BY doc_id
""",
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style heuristic quality gate with an audit trail: every
    document gets the LIST of rules it failed (empty list = passes), so
    downstream can both filter and report per-rule drop rates — the form
    real curation pipelines need (a bare boolean can't explain a 40% drop
    at 100 TB). Rule evaluation is one narrow projection; the reasons
    array is built with array_compact over CASE results, order fixed by
    the rule list on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    reasons = F.array_compact(
        F.array(
            F.when(n < QF_MIN_TOKENS, "too_short"),
            F.when(n_distinct.cast("double") / n < QF_MIN_DISTINCT_RATIO, "low_diversity"),
            F.when(n_stop.cast("double") / n > QF_MAX_STOPWORD_RATIO, "stopword_heavy"),
            F.when(
                F.col("n_chars").cast("double") / n > QF_MAX_AVG_WORD_LEN, "long_words"
            ),
        )
    )
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            # Public column is the comma-joined audit string, not the raw
            # array: hash-comparable by any harness that canonicalizes
            # through pandas (arrays are unhashable there), and just as
            # parseable downstream. Rule order is fixed by the rule list.
            F.array_join(reasons, ",").alias("reasons"),
            (F.size(reasons) == 0).alias("passes"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher repetition gate: the MassiveText repetition rules (Rae et al.
# 2021, appendix A) as a SHUFFLE-FREE per-row projection. Where
# doc_repetition_stats shuffles on (doc_id, bigram) to count, this gate
# computes the same top-/duplicate-bigram shares entirely inside the scan:
# the most-common-bigram count is the longest equal-neighbor run of the
# SORTED per-row bigram array (an O(L log L) aggregate fold per document),
# so a 100 TB gate pass is embarrassingly parallel with zero exchange.

QG_MIN_TOKENS = 20
QG_WORD_LEN_LO = 3.0
QG_WORD_LEN_HI = 5.0  # synthetic vocab is short; Gopher's band is [3, 10]
QG_MAX_TOP_BIGRAM_SHARE = 0.06
QG_MAX_DUP_BIGRAM_SHARE = 0.06
QG_MIN_DISTINCT_STOP = 2

# The most-common-bigram count is the longest equal-neighbor run in the
# SORTED per-row bigram list; the '' fold seed can never match a real
# bigram (tokens are non-empty).

_QG_RULES_SQL = f"""
list_filter([
  CASE WHEN n_tokens < {QG_MIN_TOKENS} THEN 'too_short' END,
  CASE WHEN mean_word_len < {QG_WORD_LEN_LO}
         OR mean_word_len > {QG_WORD_LEN_HI} THEN 'word_len_out_of_band' END,
  CASE WHEN top_bigram_share > {QG_MAX_TOP_BIGRAM_SHARE}
       THEN 'top_bigram_heavy' END,
  CASE WHEN dup_bigram_share > {QG_MAX_DUP_BIGRAM_SHARE}
       THEN 'dup_bigram_heavy' END,
  CASE WHEN n_stop_distinct < {QG_MIN_DISTINCT_STOP} THEN 'few_stopwords' END
], x -> x IS NOT NULL)
"""


@query(
    "gopher_repetition_gate",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_sum(list_transform(toks, w -> CAST(length(w) AS DOUBLE)))
           / len(toks) AS mean_word_len,
         len(list_distinct(list_filter(toks, x -> x IN {STOP_SQL})))
           AS n_stop_distinct
  FROM t
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS b
  FROM t WHERE len(toks) >= 2
),
c AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
d AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share,
         CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_share
  FROM c GROUP BY doc_id
),
r AS (
  SELECT m.doc_id, n_tokens, mean_word_len,
         COALESCE(top_share, 0.0) AS top_bigram_share,
         COALESCE(dup_share, 0.0) AS dup_bigram_share,
         n_stop_distinct
  FROM m LEFT JOIN d ON m.doc_id = d.doc_id
),
g AS (SELECT *, {_QG_RULES_SQL} AS reasons FROM r)
SELECT doc_id, n_tokens, mean_word_len, top_bigram_share, dup_bigram_share,
       n_stop_distinct,
       coalesce(array_to_string(reasons, ','), '') AS reasons,
       len(reasons) = 0 AS passes
FROM g ORDER BY doc_id
""",
)
def gopher_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition quality gate (Rae et al. 2021,
    appendix A, adapted to token-level statistics): length band, mean word
    length band, most-common-bigram share, duplicate-bigram share, and a
    distinct-stopword floor — each failed rule recorded in a fixed-order
    audit string like `quality_filter`'s.

    Scale design: UNLIKE `doc_repetition_stats` (one (doc_id, bigram)
    shuffle), every measure here — including the most-common-bigram count,
    via the longest equal-neighbor run of the per-row SORTED bigram array —
    is a scan-side expression, so the gate runs with zero exchanges at any
    corpus size and composes into other scans for free. The per-document
    fold is O(L log L); no corpus-sized key set ever exists. Perf shape:
    the token and bigram arrays are materialized ONCE each as projection
    columns and every measure reads the column — inlining the array
    expression into each measure re-evaluates the split/transform per
    measure per row (HOFs see no common-subexpression elimination) and
    ran ~5x slower. Reference scope: quality gating is beyond-reference
    LLM-pipeline surface (SURVEY §2.13); rule set from the public Gopher
    paper."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", tokens_col().alias("t")
    ).select(
        "doc_id",
        "t",
        # size guard, not greatest(...,0): sequence(1, 0) DESCENDS
        # ([1, 0]) and element_at(t, 0) raises INVALID_INDEX_OF_ZERO on a
        # <2-token doc (r14 review) — the oracle COALESCEs such docs to
        # zero shares, so the row must exist with an empty bigram array
        F.expr(
            "CASE WHEN size(t) >= 2 THEN"
            " transform(sequence(1, size(t) - 1),"
            "  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            " ELSE array() END"
        ).alias("bg"),
    )
    n = F.size(F.col("t"))
    mean_word_len = (
        F.expr("aggregate(t, CAST(0 AS DOUBLE), (a, x) -> a + length(x))") / n
    )
    n_bg = F.size(F.col("bg"))
    n_distinct_bg = F.size(F.array_distinct(F.col("bg")))
    top_run = F.expr(
        "aggregate(array_sort(bg),"
        " struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run,"
        "        CAST(0 AS BIGINT) AS best),"
        " (acc, x) -> struct(x AS prev,"
        "   CAST(IF(x = acc.prev, acc.run + 1, 1) AS BIGINT) AS run,"
        "   CAST(GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, 1)) AS BIGINT)"
        "     AS best),"
        " acc -> acc.best)"
    )
    top_share = F.when(
        n_bg > 0, top_run.cast("double") / n_bg.cast("double")
    ).otherwise(F.lit(0.0))
    dup_share = F.when(
        n_bg > 0, (n_bg - n_distinct_bg).cast("double") / n_bg.cast("double")
    ).otherwise(F.lit(0.0))
    n_stop_distinct = F.size(
        F.array_distinct(F.filter(F.col("t"), lambda x: x.isin(*STOPWORDS)))
    )
    measured = staged.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        top_share.alias("top_bigram_share"),
        dup_share.alias("dup_bigram_share"),
        n_stop_distinct.alias("n_stop_distinct"),
    )
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_tokens") < QG_MIN_TOKENS, "too_short"),
            F.when(
                (F.col("mean_word_len") < QG_WORD_LEN_LO)
                | (F.col("mean_word_len") > QG_WORD_LEN_HI),
                "word_len_out_of_band",
            ),
            F.when(
                F.col("top_bigram_share") > QG_MAX_TOP_BIGRAM_SHARE,
                "top_bigram_heavy",
            ),
            F.when(
                F.col("dup_bigram_share") > QG_MAX_DUP_BIGRAM_SHARE,
                "dup_bigram_heavy",
            ),
            F.when(F.col("n_stop_distinct") < QG_MIN_DISTINCT_STOP, "few_stopwords"),
        )
    )
    return (
        measured.select(
            "*",
            F.array_join(reasons, ",").alias("reasons"),
            (F.size(reasons) == 0).alias("passes"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# frequent n-gram mining: bounded-state heavy-hitter candidates + exact
# recount — the scale path for phrase/boilerplate mining where a full
# n-gram groupBy would shuffle a corpus-sized key set.

MG_NGRAM_W = 3  # phrase width in tokens
MG_CAPACITY = 8192  # per-partition Misra-Gries counter budget
# support threshold: ceil(total_windows / MG_SUPPORT_DIVISOR), floored at
# MG_MIN_SUPPORT. The exactness guarantee needs threshold > N/MG_CAPACITY;
# 1/8000 > 1/8192 makes that hold at EVERY corpus size by construction.
MG_SUPPORT_DIVISOR = 8000
MG_MIN_SUPPORT = 5
# candidate sets above this are shuffled, not broadcast (same discipline
# as dedup.VERIFY_BROADCAST_MAX_REPS)
MG_BROADCAST_MAX_CANDIDATES = 1_000_000

_FREQ_NGRAM_SQL = f"""
WITH t AS (SELECT {TOKENS_SQL} AS toks FROM documents),
e AS (
  SELECT unnest(
    CASE WHEN len(toks) >= {MG_NGRAM_W}
         THEN list_transform(range(1, len(toks) - {MG_NGRAM_W} + 2),
                i -> array_to_string(toks[i:i+{MG_NGRAM_W - 1}], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS ngram
  FROM t
),
th AS (
  SELECT greatest({MG_MIN_SUPPORT},
                  (count(*) + {MG_SUPPORT_DIVISOR - 1}) // {MG_SUPPORT_DIVISOR}) AS t
  FROM e
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
FROM e GROUP BY ngram
HAVING count(*) >= (SELECT t FROM th)
ORDER BY n_occurrences DESC, ngram
"""


def mg_fold(counts: dict[str, int], items, capacity: int) -> dict[str, int]:
    """ONE batched-decrement Misra-Gries step: fold `items` (iterable of
    (gram, count)) into `counts`, then on overflow subtract the
    d-th-smallest counter value from all and drop <=0 entries — the
    standard generalization, same lower-bound guarantee. The SHARED
    kernel (r14 review: the streaming bucket summary carried a verbatim
    copy) for the batch per-partition summary below and
    `streaming/jobs.streaming_frequent_ngrams`'s per-bucket state."""
    for g, c in items:
        counts[g] = counts.get(g, 0) + int(c)
    over = len(counts) - capacity
    if over > 0:
        cut = sorted(counts.values())[over - 1]
        counts = {g: c - cut for g, c in counts.items() if c > cut}
    return counts


def mg_ngram_col(width: int = MG_NGRAM_W):
    """The `width`-token sliding-window phrase column (array<string>)
    over `text` — shared by `frequent_ngram_mining` and both streaming
    boilerplate jobs (r14 review: three verbatim copies)."""
    toks = tokens_col()
    nwin = F.size(toks) - width + 1
    return F.when(
        F.size(toks) >= width,
        F.transform(
            F.sequence(F.lit(1), nwin),
            lambda i: F.array_join(F.slice(toks, i, width), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def mg_candidates(wins: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries over a single `ngram` string column:
    at most `capacity` candidate rows per partition, guaranteed to
    contain every item whose PARTITION count exceeds N_p/capacity (so,
    by pigeonhole over the union, every item whose GLOBAL count exceeds
    N/capacity survives in at least one partition)."""
    import pandas as pd

    def _mg(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            counts = mg_fold(counts, pdf["ngram"].value_counts().items(), capacity)
        yield pd.DataFrame({"ngram": list(counts.keys())})

    return wins.mapInPandas(_mg, "ngram string")


@query(
    "frequent_ngram_mining",
    tags=("text", "sketch", "beyond-reference"),
    oracle=_FREQ_NGRAM_SQL,
)
def frequent_ngram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 3-gram phrases with support >= max(5, ceil(N/8000)) and their
    EXACT counts — boilerplate/template mining for curation (the phrases
    a cleaning pass strips, the contamination a report flags) — computed
    with bounded per-partition state instead of a corpus-sized shuffle.

    Why not a plain groupBy: distinct n-grams grow ~linearly with corpus
    size (most occur once), so `word_frequencies`-style counting shuffles
    a key set as large as the corpus. At 100 TB that exchange is the job.
    This query instead runs the classic two-pass heavy-hitter scheme:

      1. CANDIDATES: per-partition Misra-Gries over the n-gram stream via
         `mapInPandas` (the one place Python earns its keep — a bounded-
         state sketch is not expressible with built-in aggregates).
         Capacity 8192 counters; when the dict overflows, the d-th-
         smallest count is subtracted from every counter and <=0 entries
         drop (the batched MG decrement). Per partition the output is
         <= 8192 rows regardless of input size.
         GUARANTEE (pigeonhole over the union): if an n-gram reaches the
         support threshold globally it must exceed N_p/capacity in some
         partition, so it SURVIVES there — no false negatives as long as
         threshold > N/capacity, which 1/8000 > 1/8192 ensures at every
         corpus size.
      2. EXACT RECOUNT: the (bounded) candidate set joins back against
         the n-gram stream — broadcast below 1M candidates, shuffled
         equi-join above — and exact counts filter at the threshold. The
         sketch only ever prunes; reported numbers are exact, which is
         why a plain SQL twin can oracle-check this query.

    Driver-side reads are control-plane only: one scalar count for the
    threshold and one candidate count for the broadcast decision.
    """
    docs = load_table(spark, sf_dir, "documents")
    wins = docs.select(F.explode(mg_ngram_col()).alias("ngram")).localCheckpoint()
    total = wins.count()  # free: localCheckpoint already materialized
    threshold = max(
        MG_MIN_SUPPORT, (total + MG_SUPPORT_DIVISOR - 1) // MG_SUPPORT_DIVISOR
    )

    cands = mg_candidates(wins, MG_CAPACITY).distinct().localCheckpoint()
    n_cands = cands.count()
    side = F.broadcast(cands) if n_cands <= MG_BROADCAST_MAX_CANDIDATES else cands
    return (
        wins.join(side, "ngram")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= threshold)
        .orderBy(F.desc("n_occurrences"), "ngram")
    )


# ---------------------------------------------------------------------------
# bigram PMI: collocation / phrase mining

PMI_MIN_SUPPORT = 20  # bigram must occur this often corpus-wide


@query(
    "bigram_pmi_phrases",
    tags=("text", "llm-pipeline"),
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
uni AS (
  SELECT unnest(toks) AS w FROM t
),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
nu AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM uc),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> [toks[i], toks[i + 1]])) AS p
  FROM t WHERE len(toks) >= 2
),
bc AS (
  SELECT p[1] AS w1, p[2] AS w2, count(*) AS c12
  FROM bg GROUP BY p[1], p[2]
  HAVING count(*) >= {PMI_MIN_SUPPORT}
),
nb AS (
  SELECT CAST(sum(len(toks) - 1) AS DOUBLE) AS nb
  FROM t WHERE len(toks) >= 2
)
SELECT w1, w2,
       CAST(c12 AS BIGINT) AS c12,
       CAST(u1.c AS BIGINT) AS c1,
       CAST(u2.c AS BIGINT) AS c2,
       ln((CAST(c12 AS DOUBLE) * nu * nu) / (nb * u1.c * u2.c)) AS pmi
FROM bc
JOIN uc u1 ON bc.w1 = u1.w
JOIN uc u2 ON bc.w2 = u2.w
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, w1, w2
""",
)
def bigram_pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church & Hanks
    1990; the phrase-detection statistic behind word2vec's phrase pass):
    for every adjacent token pair above a support floor,
    pmi = ln(p(w1,w2) / (p(w1) p(w2))) over corpus unigram/bigram
    distributions. High-PMI pairs are the multi-word expressions a
    tokenizer or n-gram blocklist should treat as units.

    Scale shape: one shuffle on bigram pair, one on unigram token (both
    collapse map-side); the unigram table joins back BROADCAST onto the
    support-filtered bigram table (vocabulary-sized, and the support
    floor cuts it further); the two scalar totals are 1-row broadcasts
    (J8 pattern). The transcendental is evaluated once per surviving
    pair — identical double expression tree on both engines, the
    zipf_slope discipline."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    uni = t.select(F.explode("toks").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uc.agg(F.sum("c").cast("double").alias("nu"))
    pairs = t.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("p")
    )
    bc = (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_SUPPORT)
    )
    nb = (
        t.filter(F.size("toks") >= 2)
        .agg(F.sum(F.size("toks") - 1).cast("double").alias("nb"))
    )
    u1 = uc.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1_raw")
    u2 = uc.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2_raw")
    return (
        bc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1_raw").cast("bigint").alias("c1"),
            F.col("c2_raw").cast("bigint").alias("c2"),
            F.log(
                (F.col("c12").cast("double") * F.col("nu") * F.col("nu"))
                / (F.col("nb") * F.col("c1_raw") * F.col("c2_raw"))
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


@query(
    "language_confusion_by_source",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
SELECT source, lang AS labeled_lang, {_LANG_PRED_SQL} AS predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY source, lang, {_LANG_PRED_SQL}
ORDER BY source, labeled_lang, predicted_lang
""",
)
def language_confusion_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-ID confusion matrix per source — the audit a curation
    team reads before trusting the classifier on a new source (a source
    whose labels disagree with the marker prediction is either mislabeled
    upstream or out of the classifier's domain; both mean its documents
    need review before the language filter fires). Per-row prediction is
    the shared marker-ladder column; one aggregation over a key space
    bounded by |sources| x |langs|^2, map-side collapsed."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.col("lang").alias("labeled_lang"),
            predicted_lang_col().alias("predicted_lang"),
        )
        .groupBy("source", "labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "labeled_lang", "predicted_lang")
    )
