"""BM25 retrieval over the `documents` table — the scoring half of a
retrieval / RAG data pipeline (inverted-index term joins, Okapi BM25
with the standard k1/b parameterization, per-query top-k).

The reference has no retrieval surface; this is part of the
beyond-reference LLM-pipeline layer (assignment brief: the operations a
large-scale training-data pipeline needs). Query workload is derived
DETERMINISTICALLY from the corpus itself so both engines see the same
queries with no external input: global token frequencies are ranked,
the ultra-common head (ranks 1-10, stopword-like mass) is skipped, and
ranks 11-30 pair up into ten two-term queries.

Scale design:
- the term-postings table (`tf`: doc_id, token, tf) is ONE shuffle on
  (doc_id, token); document frequencies are a vocabulary-bounded
  second aggregate — both are the classic inverted-index build;
- the 20-term query workload broadcasts onto the postings (a real
  query system holds queries driver-side the same way);
- per-query accumulation shuffles only postings that match a query
  term (ranks 11-30 → a bounded slice of the corpus), grouped on
  (qid, doc_id);
- top-k per query is a Window over qid partitions — #queries
  partitions, never a global sort. The only single-partition window is
  the row_number over the 30-row frequency head, bounded by LIMIT 30
  before it (TakeOrderedAndProject does the distributed top-30).

Cross-engine determinism: scores are rounded to 9 decimals BEFORE
ranking on both sides, so last-ulp `ln`/division differences between
the JVM and DuckDB cannot flip the top-k cut; remaining exact ties
break on doc_id. Output `score` then passes the driver's round-6
float canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.queries.text import TOKENS_SQL, tokens_col
from near_public_lakehouse_spark.sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
HEAD_SKIP = 10  # skip the stopword-like frequency head
N_QUERY_TERMS = 20  # ranks 11..30
TOP_K = 5

_BM25_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM t),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(t) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df, sum(tf) AS total FROM tf GROUP BY token),
head AS (
  SELECT token, df, row_number() OVER (ORDER BY total DESC, token) AS r
  FROM dfreq ORDER BY total DESC, token LIMIT {HEAD_SKIP + N_QUERY_TERMS}
),
qterms AS (
  SELECT CAST((r - {HEAD_SKIP + 1}) // 2 AS INT) AS qid, token, df
  FROM head WHERE r > {HEAD_SKIP}
),
scores AS (
  SELECT q.qid, f.doc_id,
         sum(ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
             * f.tf * ({BM25_K1} + 1)
             / (f.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf f USING (token)
  JOIN dl ON f.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, f.doc_id
),
topk AS (
  SELECT qid, doc_id, round(score, 9) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 9) DESC, doc_id) AS rnk
  FROM scores
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, score
FROM topk WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf): the inverted-index postings — ONE shuffle on
    (doc_id, token). Shared verbatim by the batch index build and the
    streaming indexer's per-batch partials (a document lives in exactly
    one micro-batch, so per-batch postings union losslessly)."""
    t = docs.select("doc_id", tokens_col().alias("t"))
    tok = t.select("doc_id", F.explode("t").alias("token"))
    return tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))


def _qterms(dfreq: DataFrame) -> DataFrame:
    """Derive the deterministic query workload from document frequencies:
    distributed top-(10+20) by total term mass (LIMIT bounds the only
    single-partition window to 30 rows), skip the stopword-like head,
    pair ranks 11..30 into ten two-term queries."""
    head = dfreq.orderBy(F.col("total").desc(), "token").limit(
        HEAD_SKIP + N_QUERY_TERMS
    )
    w_head = Window.orderBy(F.col("total").desc(), "token")
    return (
        head.withColumn("r", F.row_number().over(w_head))
        .filter(F.col("r") > HEAD_SKIP)
        .select(
            F.floor((F.col("r") - (HEAD_SKIP + 1)) / 2).cast("int").alias("qid"),
            "token",
            "df",
        )
    )


def _index_from_postings(tf: DataFrame, stats: DataFrame):
    """(dl, stats, tf, qterms) from an already-built postings table —
    the streaming path folds per-batch postings partials and re-enters
    here, so batch and incremental BM25 share every scoring frame.
    `dl` re-derives as sum(tf) per doc (exact: postings partition a
    document's tokens); `stats` must come from the caller because
    zero-token documents have no postings rows yet still count in
    n_docs/avgdl."""
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl"))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total")
    )
    return dl, stats, tf, _qterms(dfreq)


def _index(docs: DataFrame):
    """Shared inverted-index build: (dl, stats, tf, qterms).
    One shuffle for the postings, a vocabulary-bounded second aggregate
    for dfs, and the distributed top-30 frequency head paired into ten
    two-term queries (row_number only over the LIMIT-bounded 30 rows)."""
    t = docs.select("doc_id", tokens_col().alias("t"))
    dl = t.select("doc_id", F.size("t").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = _postings(docs)
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total")
    )
    return dl, stats, tf, _qterms(dfreq)


def _score(tf: DataFrame, dl: DataFrame, stats: DataFrame, qterms: DataFrame) -> DataFrame:
    """(qid, doc_id, score): BM25 accumulation over postings matching a
    query term — broadcast query workload, shuffle only the matching
    postings slice, grouped on (qid, doc_id). Shared by the batch query
    and the streaming-index fold (parity pinned in tests)."""
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / norm).alias("score"))
    )


def _bm25_scores(docs: DataFrame) -> DataFrame:
    dl, stats, tf, qterms = _index(docs)
    return _score(tf, dl, stats, qterms)


def _ranked(scores: DataFrame, k: int) -> DataFrame:
    """(qid, rnk, doc_id, score): deterministic per-query top-k — scores
    rounded to 9 dp BEFORE ranking, doc_id tiebreak."""
    w_q = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("score", F.round(F.col("score"), 9))
        .withColumn("rnk", F.row_number().over(w_q).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


@query(
    "retrieval_bm25_topk",
    tags=("retrieval", "text", "beyond-reference"),
    oracle=_BM25_ORACLE,
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{TOP_K} documents for ten corpus-derived two-term
    queries: inverted-index postings (one shuffle), vocabulary-bounded
    document frequencies, a broadcast 20-term query workload, and
    per-query Window top-k. idf uses the standard
    ln((N - df + 0.5)/(df + 0.5) + 1) form (always positive); tf
    saturation and length normalization use k1={BM25_K1}, b={BM25_B}."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _ranked(_bm25_scores(docs), TOP_K)
        .select("qid", "rnk", "doc_id", "score")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 + TF-IDF-cosine lists fused by reciprocal rank

RRF_K = 60  # standard RRF constant (Cormack et al. 2009)
RRF_POOL = 20  # per-ranking candidate list depth
COS_DP = 6  # cosine rounds coarser than BM25: its doc norms sum many
# more terms, so cross-engine summation-order noise is larger

_HYBRID_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM t),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(t) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df, sum(tf) AS total FROM tf GROUP BY token),
head AS (
  SELECT token, df, row_number() OVER (ORDER BY total DESC, token) AS r
  FROM dfreq ORDER BY total DESC, token LIMIT {HEAD_SKIP + N_QUERY_TERMS}
),
qterms AS (
  SELECT CAST((r - {HEAD_SKIP + 1}) // 2 AS INT) AS qid, token, df
  FROM head WHERE r > {HEAD_SKIP}
),
bm AS (
  SELECT q.qid, f.doc_id,
         sum(ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
             * f.tf * ({BM25_K1} + 1)
             / (f.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM qterms q JOIN tf f USING (token)
  JOIN dl ON f.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY q.qid, f.doc_id
),
bm_rank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 9) DESC, doc_id) AS rnk
  FROM bm
),
w AS (
  SELECT f.doc_id, f.token, f.tf * ln(CAST(s.n_docs AS DOUBLE) / d.df) AS w
  FROM tf f JOIN dfreq d USING (token) CROSS JOIN stats s
),
dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS dn FROM w GROUP BY doc_id),
qnorm AS (
  SELECT qid, sqrt(sum(pow(ln(CAST(s.n_docs AS DOUBLE) / df), 2))) AS qn
  FROM qterms CROSS JOIN stats s GROUP BY qid
),
coss AS (
  SELECT q.qid, w.doc_id,
         sum(w.w * ln(CAST(s.n_docs AS DOUBLE) / q.df))
           / (max(dn.dn) * max(qn.qn)) AS score
  FROM qterms q
  JOIN w ON w.token = q.token
  CROSS JOIN stats s
  JOIN dnorm dn ON dn.doc_id = w.doc_id
  JOIN qnorm qn ON qn.qid = q.qid
  GROUP BY q.qid, w.doc_id
),
cos_rank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, {COS_DP}) DESC, doc_id) AS rnk
  FROM coss
),
pool AS (
  SELECT qid, doc_id, 1.0 / ({RRF_K} + rnk) AS c
  FROM bm_rank WHERE rnk <= {RRF_POOL}
  UNION ALL
  SELECT qid, doc_id, 1.0 / ({RRF_K} + rnk) AS c
  FROM cos_rank WHERE rnk <= {RRF_POOL}
),
rrf AS (
  SELECT qid, doc_id, round(sum(c), 9) AS rrf_score
  FROM pool GROUP BY qid, doc_id
),
fin AS (
  SELECT qid, doc_id, rrf_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM rrf
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, rrf_score
FROM fin WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


@query(
    "retrieval_hybrid_rrf",
    bench=True,
    tags=("retrieval", "text", "beyond-reference"),
    oracle=_HYBRID_ORACLE,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the same ten
    corpus-derived queries scored by two independent rankers — Okapi
    BM25 and TF-IDF cosine (full-vector document norms, idf-weighted
    query vector) — each truncated to its top-{RRF_POOL}, fused as
    sum(1/({RRF_K}+rank)) per document, top-{TOP_K} emitted per query.
    RRF is the standard way production retrieval mixes sparse rankers
    (and, with an ANN list, dense ones — `embedding_topk_cosine` /
    `ivf_topk` produce exactly such a list) without score calibration:
    only RANKS cross the fusion boundary.

    Scale: both rankers reuse the same one-shuffle postings table; the
    cosine doc norms are one extra O(postings) aggregate; fusion state
    is 2x{RRF_POOL} rows per query. Determinism: each ranker's scores
    round (9 dp BM25, {COS_DP} dp cosine — coarser because full-vector
    norms accumulate more summation-order noise) before ranking with
    doc_id tiebreaks, so the fused output depends on cross-engine-stable
    ranks, never on raw float score equality."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE materialized index for both rankers (r15 optimization round,
    # guide §2.4/§5): the old plan re-entered `_index(docs)` once per
    # consumer — `.explain("formatted")` showed 28 parquet scans of
    # `documents`, each re-running the tokenize + explode + postings
    # chain (plans/r15/retrieval_hybrid_rrf_before.txt). The postings
    # (O(corpus tokens), ONE shuffle), per-doc lengths (O(docs)) and
    # vocabulary-bounded dfreq are each computed once and
    # localCheckpointed; every ranker frame below re-reads those blocks
    # instead of the corpus. After: 1 documents scan
    # (plans/r15/retrieval_hybrid_rrf_after.txt).
    t = docs.select("doc_id", tokens_col().alias("t"))
    dl = t.select("doc_id", F.size("t").alias("dl")).localCheckpoint(eager=False)
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        t.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq_full = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total")
    ).localCheckpoint(eager=False)
    qterms = _qterms(dfreq_full)
    dfreq = dfreq_full.select("token", "df")

    bm_rank = _ranked(_score(tf, dl, stats, qterms), RRF_POOL).select(
        "qid", "doc_id", "rnk"
    )

    n_docs = F.col("n_docs").cast("double")
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(n_docs / F.col("df"))).alias("w"),
        )
    )
    dnorm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dn"))
    qnorm = (
        qterms.crossJoin(F.broadcast(stats))
        .groupBy("qid")
        .agg(F.sqrt(F.sum(F.pow(F.log(n_docs / F.col("df")), 2))).alias("qn"))
    )
    coss = (
        w.join(F.broadcast(qterms.select("qid", "token", "df")), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(F.col("w") * F.log(n_docs / F.col("df"))).alias("dot"),
        )
        .join(dnorm, "doc_id")
        .join(F.broadcast(qnorm), "qid")
        .select(
            "qid", "doc_id", (F.col("dot") / (F.col("dn") * F.col("qn"))).alias("score")
        )
    )
    w_cos = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), COS_DP).desc(), F.col("doc_id")
    )
    cos_rank = (
        coss.withColumn("rnk", F.row_number().over(w_cos))
        .filter(F.col("rnk") <= RRF_POOL)
        .select("qid", "doc_id", "rnk")
    )

    pool = bm_rank.unionByName(cos_rank).select(
        "qid", "doc_id", (F.lit(1.0) / (RRF_K + F.col("rnk"))).alias("c")
    )
    rrf = pool.groupBy("qid", "doc_id").agg(F.round(F.sum("c"), 9).alias("rrf_score"))
    w_fin = Window.partitionBy("qid").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        rrf.withColumn("rnk", F.row_number().over(w_fin).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "doc_id", "rrf_score")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# query-likelihood retrieval (Dirichlet smoothing) — the LM ranker

QL_MU = 100.0  # Dirichlet pseudo-count; sized to this corpus's ~30-token
# docs (the standard 2000-2500 default assumes full web documents and
# would swamp the per-doc evidence here)

_QL_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM t),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(t) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df, sum(tf) AS total FROM tf GROUP BY token),
head AS (
  SELECT token, df, row_number() OVER (ORDER BY total DESC, token) AS r
  FROM dfreq ORDER BY total DESC, token LIMIT {HEAD_SKIP + N_QUERY_TERMS}
),
qterms AS (
  SELECT CAST((r - {HEAD_SKIP + 1}) // 2 AS INT) AS qid, token
  FROM head WHERE r > {HEAD_SKIP}
),
coll AS (SELECT CAST(sum(tf) AS DOUBLE) AS n_tokens FROM tf),
ptc AS (
  SELECT q.qid, q.token, d.total / c.n_tokens AS p_c
  FROM qterms q JOIN dfreq d USING (token) CROSS JOIN coll c
),
cand AS (
  SELECT DISTINCT q.qid, f.doc_id
  FROM qterms q JOIN tf f USING (token)
),
scored AS (
  SELECT c.qid, c.doc_id,
         sum(ln((COALESCE(f.tf, 0) + {QL_MU} * p.p_c) / (dl.dl + {QL_MU}))) AS score
  FROM cand c
  JOIN ptc p ON p.qid = c.qid
  LEFT JOIN tf f ON f.doc_id = c.doc_id AND f.token = p.token
  JOIN dl ON dl.doc_id = c.doc_id
  GROUP BY c.qid, c.doc_id
),
topk AS (
  SELECT qid, doc_id, round(score, 9) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 9) DESC, doc_id) AS rnk
  FROM scored
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, score
FROM topk WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


@query(
    "retrieval_query_likelihood",
    tags=("retrieval", "text", "beyond-reference"),
    oracle=_QL_ORACLE,
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (the LM ranker that
    completes the classic trio with BM25 and TF-IDF cosine):
    score(d,q) = sum over query terms of
    ln((tf + mu*p(t|C)) / (dl + mu)), mu={QL_MU}. Unlike BM25, ABSENT
    query terms still contribute (the smoothed collection probability),
    so candidates (docs matching >= 1 term) re-join the full per-query
    term list with tf defaulting to 0 — the structural difference this
    query exists to exercise. Collection stats p(t|C) live on the
    broadcast 20-term workload; the candidate set, not the corpus, pays
    the second join. Determinism: same round-9dp-before-rank rule."""
    docs = load_table(spark, sf_dir, "documents")
    dl, stats, tf, qterms = _index(docs)
    dfreq = tf.groupBy("token").agg(F.sum("tf").alias("total"))
    coll = tf.agg(F.sum("tf").cast("double").alias("n_tokens"))
    ptc = (
        qterms.select("qid", "token")
        .join(dfreq, "token")
        .crossJoin(F.broadcast(coll))
        .select("qid", "token", (F.col("total") / F.col("n_tokens")).alias("p_c"))
    )
    cand = (
        tf.join(F.broadcast(qterms.select("qid", "token")), "token")
        .select("qid", "doc_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(ptc), "qid")
        .join(
            tf.select("doc_id", "token", "tf"),
            ["doc_id", "token"],
            "left",
        )
        .join(dl, "doc_id")
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + QL_MU * F.col("p_c"))
                    / (F.col("dl") + QL_MU)
                )
            ).alias("score")
        )
    )
    return (
        _ranked(scored, TOP_K)
        .select("qid", "rnk", "doc_id", "score")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# dense + sparse hybrid: more-like-this over aligned documents/embeddings

MLT_Q = 5  # query docs = doc_id < 5 (aligned with embeddings.vec_id)
MLT_TERMS = 3  # distinctive terms per query doc for the sparse side
MLT_POOL = 20

_MLT_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM t),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(t) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
qw AS (
  SELECT f.doc_id AS qid, f.token, d.df,
         f.tf * ln(CAST(s.n_docs AS DOUBLE) / d.df) AS w
  FROM tf f JOIN dfreq d USING (token) CROSS JOIN stats s
  WHERE f.doc_id < {MLT_Q}
),
qsel AS (
  SELECT qid, token, df,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(w, 9) DESC, token) AS r
  FROM qw
),
qterms AS (SELECT qid, token, df FROM qsel WHERE r <= {MLT_TERMS}),
bm AS (
  SELECT q.qid, f.doc_id,
         sum(ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
             * f.tf * ({BM25_K1} + 1)
             / (f.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM qterms q JOIN tf f USING (token)
  JOIN dl ON f.doc_id = dl.doc_id CROSS JOIN stats s
  WHERE f.doc_id <> q.qid
  GROUP BY q.qid, f.doc_id
),
bm_rank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 9) DESC, doc_id) AS rnk
  FROM bm
),
qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {MLT_Q}),
prods AS (
  SELECT qid, vec_id AS cid,
         unnest(qe) AS qx, unnest(embedding) AS cx
  FROM qv, embeddings
  WHERE vec_id <> qid
),
dots AS (
  SELECT qid, cid,
         sum(CAST(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE) AS DECIMAL(30,15))) AS dot,
         sum(CAST(CAST(qx AS DOUBLE) * CAST(qx AS DOUBLE) AS DECIMAL(30,15))) AS qnorm2,
         sum(CAST(CAST(cx AS DOUBLE) * CAST(cx AS DOUBLE) AS DECIMAL(30,15))) AS cnorm2
  FROM prods GROUP BY qid, cid
),
dense_rank_ AS (
  SELECT qid, cid AS doc_id,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY CAST(dot AS DOUBLE)
                    / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(cnorm2 AS DOUBLE))) DESC,
                    cid) AS rnk
  FROM dots
),
pool AS (
  SELECT qid, doc_id, 1.0 / ({RRF_K} + rnk) AS c FROM bm_rank WHERE rnk <= {MLT_POOL}
  UNION ALL
  SELECT qid, doc_id, 1.0 / ({RRF_K} + rnk) AS c FROM dense_rank_ WHERE rnk <= {MLT_POOL}
),
rrf AS (
  SELECT qid, doc_id, round(sum(c), 9) AS rrf_score FROM pool GROUP BY qid, doc_id
),
fin AS (
  SELECT qid, doc_id, rrf_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM rrf
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, rrf_score
FROM fin WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


@query(
    "retrieval_mlt_hybrid",
    tags=("retrieval", "similarity", "beyond-reference"),
    oracle=_MLT_ORACLE,
)
def retrieval_mlt_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense+sparse more-like-this: for each of the first {MLT_Q} query
    documents (documents.doc_id aligns 1:1 with embeddings.vec_id in the
    testdata), fuse (a) BM25 over the query doc's top-{MLT_TERMS}
    distinctive terms (tf*idf within the doc — the classic Lucene
    MoreLikeThis term selection) with (b) exact embedding cosine, by
    reciprocal rank over top-{MLT_POOL} pools. This is the
    production-standard sparse+dense hybrid shape: the dense list would
    come from `ivf_topk`/`ann_lsh_topk` at scale — exact cosine here
    keeps the oracle exact.

    Determinism: the sparse side rounds 9 dp before ranking; the dense
    side needs NO rounding — dot products and norms are exact decimal
    folds on both engines (the `embedding_topk_cosine` discipline), so
    the derived cosines are bit-identical."""
    from near_public_lakehouse_spark.queries.similarity import _dot_dec_col

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dl, stats, tf, _ = _index(docs)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    n_docs = F.col("n_docs").cast("double")
    qw = (
        tf.filter(F.col("doc_id") < MLT_Q)
        .join(dfreq, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("doc_id").alias("qid"),
            "token",
            "df",
            (F.col("tf") * F.log(n_docs / F.col("df"))).alias("w"),
        )
    )
    w_sel = Window.partitionBy("qid").orderBy(
        F.round(F.col("w"), 9).desc(), F.col("token")
    )
    qterms = (
        qw.withColumn("r", F.row_number().over(w_sel))
        .filter(F.col("r") <= MLT_TERMS)
        .select("qid", "token", "df")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    bm = (
        tf.join(F.broadcast(qterms), "token")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / norm).alias("score"))
    )
    w_bm = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id")
    )
    bm_rank = (
        bm.withColumn("rnk", F.row_number().over(w_bm))
        .filter(F.col("rnk") <= MLT_POOL)
        .select("qid", "doc_id", "rnk")
    )

    vnorm = F.sqrt(_dot_dec_col(F.col("embedding"), F.col("embedding")).cast("double"))
    qv = emb.filter(F.col("vec_id") < MLT_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), vnorm.alias("qn")
    )
    cv = emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("ce"), vnorm.alias("cn")
    )
    cosine = _dot_dec_col(F.col("qe"), F.col("ce")).cast("double") / (
        F.col("qn") * F.col("cn")
    )
    w_dense = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("doc_id"))
    dense_rank = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("doc_id") != F.col("qid"))
        .select("qid", "doc_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w_dense))
        .filter(F.col("rnk") <= MLT_POOL)
        .select("qid", "doc_id", "rnk")
    )

    pool = bm_rank.unionByName(dense_rank).select(
        "qid", "doc_id", (F.lit(1.0) / (RRF_K + F.col("rnk"))).alias("c")
    )
    rrf = pool.groupBy("qid", "doc_id").agg(F.round(F.sum("c"), 9).alias("rrf_score"))
    w_fin = Window.partitionBy("qid").orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        rrf.withColumn("rnk", F.row_number().over(w_fin).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "doc_id", "rrf_score")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# per-document keyword extraction (tf-idf top terms) — doc tagging

KW_PER_DOC = 3


@query(
    "keyword_extraction_tfidf",
    tags=("retrieval", "text", "llm-pipeline"),
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM t),
w AS (
  SELECT f.doc_id, f.token,
         f.tf * ln(nn.n_docs / d.df) AS w
  FROM tf f JOIN dfreq d USING (token) CROSS JOIN nn
),
ranked AS (
  SELECT doc_id, token, round(w, 9) AS weight,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(w, 9) DESC, token) AS rnk
  FROM w
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token AS keyword, weight
FROM ranked WHERE rnk <= {KW_PER_DOC}
ORDER BY doc_id, rnk
""",
)
def keyword_extraction_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{KW_PER_DOC} distinctive terms per document by tf*ln(N/df) —
    the doc-tagging op (Lucene MoreLikeThis term selection, applied
    corpus-wide; `retrieval_mlt_hybrid` uses the same selection for its
    query docs only). One postings shuffle + a vocabulary-bounded df
    aggregate + a per-doc window (partitioned on doc_id, never global).
    Determinism: weights round 9 dp before ranking, token tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    _, stats, tf, _ = _index(docs)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = F.col("n_docs").cast("double")
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(n_docs / F.col("df")), 9).alias("weight"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.col("weight").desc(), F.col("token"))
    return (
        w.withColumn("rnk", F.row_number().over(w_doc).cast("bigint"))
        .filter(F.col("rnk") <= KW_PER_DOC)
        .select("doc_id", "rnk", F.col("token").alias("keyword"), "weight")
        .orderBy("doc_id", "rnk")
    )
