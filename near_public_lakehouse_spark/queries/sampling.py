"""Training-data pipeline ops over `documents`: deterministic sampling,
context-window chunking, and token-budget sequence packing.

All three are pure JVM-side column expressions (no Python on the hot path)
and all three are fully oracle-checked: the sampling hash is the same
md5-prefix trick the dedup module uses, chunk extraction is 1-based substr
on both engines, and packing is exact integer prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.numeric import md5_prefix_int

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.queries.text import TOKENS_SQL, tokens_col
from near_public_lakehouse_spark.sources.tables import load_table

# Per-language sampling rates (percent): downsample the over-represented
# language, keep the rest at a higher rate — the standard corpus-balancing
# move before training.
EN_RATE, OTHER_RATE = 10, 30


def _bucket_col(key):
    """Deterministic 0..99 bucket from a key column — identical on DuckDB."""
    return md5_prefix_int(key.cast("string")) % 100


BUCKET_SQL = "('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT % 100"


@query(
    "stratified_sample",
    tags=("sampling",),
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {BUCKET_SQL.format(key="doc_id")} <
      CASE WHEN lang = 'en' THEN {EN_RATE} ELSE {OTHER_RATE} END
ORDER BY doc_id
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each doc hashes to a 0..99 bucket
    (md5 of its id) and is kept iff the bucket is under its stratum's rate.

    Scale notes: a pure narrow filter — no shuffle, no RNG state, and the
    same rows are kept on any cluster size or retry (unlike `df.sample`,
    whose seed is per-partition-index and changes with repartitioning).
    Rates are tuned per stratum; membership is also stable under rate
    increases (bucket < 10 rows are a subset of bucket < 30 rows), which
    makes grow-the-sample reruns incremental.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", EN_RATE).otherwise(OTHER_RATE)
    return (
        docs.filter(_bucket_col(F.col("doc_id")) < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


CHUNK_STRIDE = 192
CHUNK_LEN = 256  # 64-char overlap between consecutive chunks


@query(
    "doc_chunks",
    tags=("sampling", "G1"),
    oracle=f"""
SELECT doc_id, g AS chunk_id,
       length(substr(text, g * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS chunk_len,
       md5(substr(text, g * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS chunk_md5
FROM (SELECT doc_id, text,
             unnest(range(0, (n_chars - 1) // {CHUNK_STRIDE} + 1)) AS g
      FROM documents)
ORDER BY doc_id, chunk_id
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping fixed-width character windows
    (stride 192, width 256) per document — the split step before tokenizing
    long documents into model-sized sequences.

    Scale notes: explode(sequence(...)) fans each row out to its chunk
    count with no shuffle; chunk extraction is a substring on the already-
    loaded text column. Output carries (len, md5) per chunk rather than the
    chunk text — the pattern for verifying a chunker without re-writing the
    corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks_last = F.expr(f"(n_chars - 1) div {CHUNK_STRIDE}")
    chunk = F.col("text").substr(
        (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"), F.lit(CHUNK_LEN)
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks_last)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


PACK_BUDGET = 4096  # tokens per packed training sequence


@query(
    "pack_sequences",
    tags=("sampling", "W"),
    oracle=f"""
SELECT doc_id, source, n_toks,
       CAST((cum - n_toks) // {PACK_BUDGET} AS BIGINT) AS bin
FROM (
  SELECT doc_id, source, len({TOKENS_SQL}) AS n_toks,
         sum(len({TOKENS_SQL})) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
ORDER BY source, doc_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: documents are assigned to training
    bins by the running token count within their source, bin = floor of the
    pre-document prefix sum / budget — the streaming-friendly packing rule
    (each doc's bin depends only on documents before it).

    Scale notes: one window over (source, doc_id) — a single shuffle on
    source; the running sum uses an explicit ROWS frame (SURVEY §2.6 notes
    the reference never needs frames; a packing engine does). Exact integer
    arithmetic end to end.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("doc_id", "source", F.size(tokens_col()).alias("n_toks"))
        .select(
            "doc_id",
            "source",
            "n_toks",
            F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / PACK_BUDGET).alias("bin"),
        )
        .orderBy("source", "doc_id")
    )


QUALITY_CUT = 0.66
_Q_SQL = (
    f"least(1.0, len({TOKENS_SQL}) / 64.0) * 0.4"
    f" + len(list_distinct({TOKENS_SQL})) / len({TOKENS_SQL}) * 0.4"
    " + (1.0 - len(list_filter("
    f"{TOKENS_SQL}, x -> x IN ('the', 'a', 'of', 'an', 'to', 'and', 'in')"
    f")) / len({TOKENS_SQL})) * 0.2"
)


@query(
    "corpus_prep",
    bench=True,
    tags=("sampling", "dedup", "text"),
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang, source,
         len({TOKENS_SQL}) AS n_toks,
         md5(lower(trim(text))) AS fingerprint
  FROM documents
  WHERE {_Q_SQL} >= {QUALITY_CUT}
),
keepers AS (
  SELECT doc_id, lang, source, n_toks
  FROM (SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM q)
  WHERE doc_id = keeper
),
sampled AS (
  SELECT * FROM keepers
  WHERE {BUCKET_SQL.format(key="doc_id")} <
        CASE WHEN lang = 'en' THEN {EN_RATE} ELSE {OTHER_RATE} END
)
SELECT doc_id, lang, source, n_toks,
       CAST((cum - n_toks) // {PACK_BUDGET} AS BIGINT) AS bin
FROM (
  SELECT *, sum(n_toks) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sampled
)
ORDER BY doc_id
""",
)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship training-data pipeline, end to end in one plan: quality
    prefilter -> exact-dedup keeper election -> stratified downsampling ->
    token-budget sequence packing.

    Scale notes: the whole chain is two shuffles — one on the dedup
    fingerprint (keeper election via window min), one on source for the
    packing window; quality scoring and sampling are narrow. The stages are
    ordered so each shuffle sees fewer rows than the one before (filter
    first, dedup second, sample before packing). That ordering — not the
    individual operators — is what keeps this viable at 100 TB.
    """
    from pyspark.sql import Window as W

    from near_public_lakehouse_spark.queries.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks).cast("double")
    quality = (
        F.least(F.lit(1.0), F.size(toks) / F.lit(64.0)) * 0.4
        + (F.size(F.array_distinct(toks)) / n) * 0.4
        + (F.lit(1.0) - F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / n) * 0.2
    )
    q = docs.filter(quality >= QUALITY_CUT).select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_toks"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    )
    keepers = (
        q.withColumn("keeper", F.min("doc_id").over(W.partitionBy("fingerprint")))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("fingerprint", "keeper")
    )
    rate = F.when(F.col("lang") == "en", EN_RATE).otherwise(OTHER_RATE)
    sampled = keepers.filter(_bucket_col(F.col("doc_id")) < rate)
    packw = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return sampled.select(
        "doc_id",
        "lang",
        "source",
        "n_toks",
        F.floor((F.sum("n_toks").over(packw) - F.col("n_toks")) / PACK_BUDGET).alias("bin"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus mixture rebalancing

# Target language mixture (percent of the post-rebalance corpus). The
# standard domain/language reweighting move before training: upsample
# under-represented strata toward a declared target mixture.
MIX_TARGET_PCT = {"en": 40, "fr": 15, "es": 15, "de": 15, "zh": 15}

_PCT_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIX_TARGET_PCT.items()
) + " ELSE 0 END"


@query(
    "mixture_upsample",
    tags=("sampling", "A1"),
    oracle=f"""
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
t AS (SELECT count(*) AS n_total FROM documents),
w AS (
  SELECT lang, n_lang, n_total, CAST({_PCT_SQL} AS BIGINT) AS pct
  FROM c, t
)
SELECT d.doc_id, d.lang,
       (pct * n_total) // (100 * n_lang)
         + CASE WHEN {BUCKET_SQL.format(key="d.doc_id")}
                     < ((pct * n_total) % (100 * n_lang)) * 100 // (100 * n_lang)
                THEN 1 ELSE 0 END AS n_copies
FROM documents d JOIN w USING (lang)
ORDER BY d.doc_id
""",
)
def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture rebalancing: each document gets an integer
    copy count so that every language's expected post-rebalance share
    matches MIX_TARGET_PCT. The exact factor target_share/actual_share is
    realized in pure integer arithmetic — floor(factor) copies for every
    doc plus one extra for the md5-bucket fraction of docs that covers the
    remainder — so results are identical on any engine, cluster size, or
    retry (no RNG, no floats). A factor below 1 downsamples: the bucket
    fraction alone decides which docs of an over-represented stratum
    survive (n_copies = 0 drops the doc), mirroring how rates work in
    stratified_sample.

    Scale notes: stratum counts are a tiny groupBy broadcast back onto the
    corpus (one narrow join, no corpus shuffle); the copy expansion
    downstream is posexplode(sequence(1, n_copies)) at write time. At
    100 TB the counts come from table stats rather than a scan, but the
    per-doc plan is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    n_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    pct = None
    for k, v in MIX_TARGET_PCT.items():
        pct = F.when(F.col("lang") == k, v) if pct is None else pct.when(F.col("lang") == k, v)
    w = (
        n_lang.crossJoin(F.broadcast(n_total))
        .withColumn("pct", pct.otherwise(0).cast("bigint"))
    )
    base = F.expr("(pct * n_total) DIV (100 * n_lang)")
    extra_threshold = F.expr("((pct * n_total) % (100 * n_lang)) * 100 DIV (100 * n_lang)")
    return (
        docs.join(F.broadcast(w), "lang")
        .select(
            "doc_id",
            "lang",
            (
                base
                + F.when(_bucket_col(F.col("doc_id")) < extra_threshold, 1).otherwise(0)
            ).alias("n_copies"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis)

WES_K = 25  # exact per-source quota
WES_SEED = "wes-r6"

# seeded uniform in (0,1) from the doc id — the shard_manifest trick
_WES_U_SQL = (
    f"((('0x' || substr(md5('{WES_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " % 1000000) + 0.5) / 1000000.0"
)
# quality weight, strictly positive (the quality_scores formula)
_WES_W_SQL = f"""
(least(1.0, len({TOKENS_SQL}) / 64.0) * 0.4
 + len(list_distinct({TOKENS_SQL})) / len({TOKENS_SQL}) * 0.4
 + (1.0 - len(list_filter({TOKENS_SQL}, x -> x IN
     ('the', 'a', 'of', 'an', 'to', 'and', 'in'))) / len({TOKENS_SQL})) * 0.2)
"""


@query(
    "weighted_sample_quality",
    tags=("sampling", "llm-pipeline"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, {_WES_W_SQL} AS weight,
         ln({_WES_U_SQL}) / {_WES_W_SQL} AS es_key
  FROM documents
),
rk AS (
  SELECT doc_id, source, weight, es_key,
         row_number() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id)
           AS rnk
  FROM keyed
)
SELECT doc_id, source, weight, es_key, CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= {WES_K}
ORDER BY source, rnk
""",
)
def weighted_sample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact per-source quota:
    each document gets key ln(u) / w (u = seeded md5 uniform, w = its
    quality score) and the top-{WES_K} keys per source are drawn — the
    Efraimidis-Spirakis A-ES scheme (2006; ln(u)/w is the monotone form
    of their u^(1/w) key), under which inclusion probability is
    proportional to weight. Complements the rate-based samplers
    (stratified_sample / quality_mixture_sample hit quotas only in
    expectation) with an EXACT-size, quality-biased draw; the hash-
    seeded u makes the sample identical under any partitioning, engine,
    or rerun — so the whole randomized scheme is driver-hash-checked.

    Plan: weights and keys are scan-side column arithmetic; one window
    per source. At 100 TB per-source quotas become per-partition top-K
    heaps + a K*P merge, the TakeOrderedAndProject shape per group."""
    return weighted_sample_frame(load_table(spark, sf_dir, "documents"))


def weighted_sample_frame(docs: DataFrame) -> DataFrame:
    """Core of weighted_sample_quality over any (doc_id, source, text)
    frame — shared with the streaming twin so the surfaces cannot
    drift."""
    toks = tokens_col()
    n = F.size(toks).cast("double")
    w_expr = (
        F.least(F.lit(1.0), F.size(toks) / F.lit(64.0)) * 0.4
        + (F.size(F.array_distinct(toks)) / n) * 0.4
        + (
            F.lit(1.0)
            - F.size(
                F.filter(
                    toks,
                    lambda x: x.isin("the", "a", "of", "an", "to", "and", "in"),
                )
            )
            / n
        )
        * 0.2
    )
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{WES_SEED}:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).cast("double")
        + 0.5
    ) / 1000000.0
    keyed = docs.select(
        "doc_id",
        "source",
        w_expr.alias("weight"),
        (F.log(u) / w_expr).alias("es_key"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("es_key"), "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= WES_K)
        .orderBy("source", "rnk")
    )
