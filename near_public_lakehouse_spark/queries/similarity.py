"""Similarity search over the `embeddings` table (`array<float>` column):
brute-force cosine top-k (oracle-checked baseline), label centroids, and a
random-hyperplane LSH-bucketed ANN variant (the scale path; rows-only).

Exactness rule for dot products: each elementwise product is computed in
DOUBLE (exact for float inputs) then rounded to DECIMAL(30,15) before the
sum, so the reduction is order-independent and bit-identical across engines
and across parallelism levels — same discipline as the money math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries.registry import query
from near_public_lakehouse_spark.sources.tables import load_table

N_QUERY_VECS = 5
TOP_K = 5

# DuckDB: exact decimal dot product of two FLOAT[] via zipped unnest happens
# in the query; Spark uses an array-HOF fold. Both sum DECIMAL(30,15).
_DOT_DEC = "decimal(30,15)"
_ACC_DEC = "decimal(38,15)"


def _dot_dec_col(a, b):
    """Exact fold: sum_i round(a_i * b_i, 15dp) as decimal — order-free."""
    products = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DOT_DEC)
    )
    return F.aggregate(
        products,
        F.lit(0).cast(_ACC_DEC),
        lambda acc, p: (acc + p.cast(_ACC_DEC)).cast(_ACC_DEC),
    )


@query(
    "embedding_topk_cosine",
    tags=("similarity", "ann"),
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
prods AS (
  SELECT qid, vec_id AS cid,
         unnest(qe) AS qv, unnest(embedding) AS cv
  FROM q, embeddings
  WHERE vec_id <> qid
),
dots AS (
  SELECT qid, cid,
         sum(CAST(CAST(qv AS DOUBLE) * CAST(cv AS DOUBLE) AS DECIMAL(30,15))) AS dot,
         sum(CAST(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE) AS DECIMAL(30,15))) AS qnorm2,
         sum(CAST(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE) AS DECIMAL(30,15))) AS cnorm2
  FROM prods GROUP BY qid, cid
),
scored AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(cnorm2 AS DOUBLE)))
           AS cosine,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY CAST(dot AS DOUBLE)
                    / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(cnorm2 AS DOUBLE))) DESC,
                    cid) AS rnk
  FROM dots
)
SELECT qid, cid, cosine, rnk FROM scored
WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
""",
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the correctness baseline every ANN variant
    is judged against.

    Scale notes: the query side is tiny and broadcast; candidates stream
    through a narrow map (HOF fold per row — no explode of the vector
    dimension, unlike the oracle) followed by a per-query top-k. At 100 TB
    the brute-force scan is the fallback; ann_lsh_topk is the indexed path.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("cid") != F.col("qid"))
    dot = _dot_dec_col(F.col("qe"), F.col("ce"))
    qn = _dot_dec_col(F.col("qe"), F.col("qe"))
    cn = _dot_dec_col(F.col("ce"), F.col("ce"))
    cosine = dot.cast("double") / (F.sqrt(qn.cast("double")) * F.sqrt(cn.cast("double")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        joined.select("qid", "cid", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("qid", "rnk")
    )


@query(
    "label_centroids",
    tags=("similarity",),
    oracle="""
SELECT label, pos,
       CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*)
         AS centroid_val,
       count(*) AS n_vectors
FROM (SELECT label, unnest(embedding) AS val,
             unnest(range(len(embedding))) AS pos
      FROM embeddings)
GROUP BY label, pos
ORDER BY label, pos
""",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (elementwise mean) — the k-means/IVF coarse
    quantizer building block. posexplode + two-key groupBy: one shuffle of
    (label, pos, val) triples; partial aggregation keeps it compact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


# Deterministic "random" hyperplanes for LSH: signs derived from md5 of
# (plane, dim) — reproducible everywhere, no RNG state.
N_PLANES = 8


@query("ann_lsh_topk", tags=("similarity", "ann", "lsh"), oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection LSH: 8 deterministic ±1 hyperplanes
    -> 8-bit bucket; candidates share the query's bucket; exact cosine
    rerank inside the bucket.

    Scale notes: this is the 100 TB similarity path — bucketing is a
    per-row map, the join is equi-key on an 8-bit code (optionally
    multi-probe), and the expensive exact rerank touches ~1/256 of the
    corpus per query. No oracle: LSH banding isn't expressible in
    plain SQL without replicating the whole plane table (the brute-force
    twin `embedding_topk_cosine` is the accuracy baseline).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64

    def sign(plane: int, d: int) -> int:
        import hashlib

        h = hashlib.md5(f"plane{plane}_dim{d}".encode()).hexdigest()
        return 1 if int(h[:8], 16) % 2 == 0 else -1

    planes = [[float(sign(p, d)) for d in range(dim)] for p in range(N_PLANES)]
    planes_lit = F.array(
        *[F.array(*[F.lit(v) for v in plane]) for plane in planes]
    )

    def bucket(vec):
        # bit p = 1 iff dot(vec, plane_p) > 0; fold to one integer code
        return F.aggregate(
            F.transform(
                planes_lit,
                lambda plane, i: F.when(
                    F.aggregate(
                        F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    > 0,
                    F.pow(F.lit(2.0), i).cast("int"),
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda a, x: a + x,
        )

    coded = emb.select(
        "vec_id", "embedding", bucket(F.col("embedding")).alias("bucket")
    )
    q = coded.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cands = coded.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cbucket"),
    )
    joined = cands.join(
        F.broadcast(q),
        (F.col("cbucket") == F.col("qbucket")) & (F.col("cid") != F.col("qid")),
    )
    dot = _dot_dec_col(F.col("qe"), F.col("ce"))
    qn = _dot_dec_col(F.col("qe"), F.col("qe"))
    cn = _dot_dec_col(F.col("ce"), F.col("ce"))
    cosine = dot.cast("double") / (F.sqrt(qn.cast("double")) * F.sqrt(cn.cast("double")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        joined.select("qid", "cid", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("qid", "rnk")
    )
