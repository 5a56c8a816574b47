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
    t = docs.select("doc_id", tokens_col().alias("t"))
    dl = t.select("doc_id", F.size("t").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tok = t.select("doc_id", F.explode("t").alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total")
    )
    # distributed top-30 (TakeOrderedAndProject), THEN a row_number over
    # the bounded 30-row result — never a vocabulary-wide window
    head = dfreq.orderBy(F.col("total").desc(), "token").limit(
        HEAD_SKIP + N_QUERY_TERMS
    )
    w_head = Window.orderBy(F.col("total").desc(), "token")
    qterms = (
        head.withColumn("r", F.row_number().over(w_head))
        .filter(F.col("r") > HEAD_SKIP)
        .select(
            F.floor((F.col("r") - (HEAD_SKIP + 1)) / 2).cast("int").alias("qid"),
            "token",
            "df",
        )
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scores = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / norm).alias("score"))
    )
    w_q = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("score", F.round(F.col("score"), 9))
        .withColumn("rnk", F.row_number().over(w_q).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "doc_id", "score")
        .orderBy("qid", "rnk")
    )
