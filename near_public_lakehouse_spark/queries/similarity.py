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
    bench=True,
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
    return embedding_topk_frame(emb)


def embedding_topk_frame(emb: DataFrame) -> DataFrame:
    """Core of embedding_topk_cosine over any (vec_id, embedding) frame —
    the exact baseline the ANN recall sweeps compare against."""
    # Norms are per-vector: fold them once before the join, not per pair.
    norm = F.sqrt(_dot_dec_col(F.col("embedding"), F.col("embedding")).cast("double"))
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), norm.alias("qnorm")
    )
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"), norm.alias("cnorm")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("cid") != F.col("qid"))
    dot = _dot_dec_col(F.col("qe"), F.col("ce"))
    cosine = dot.cast("double") / (F.col("qnorm") * F.col("cnorm"))
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


# Cells probed per query by the registered ivf_topk: >1 recovers neighbors
# that sit just across a cell boundary (the known single-probe failure
# mode); tests/test_ann_recall.py sweeps recall@k over nprobe.
IVF_NPROBE = 2


@query(
    "ivf_topk",
    tags=("similarity", "ann", "ivf"),
    oracle=f"""
WITH exp AS (
  SELECT label, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS cv
  FROM exp GROUP BY label, pos
),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
qexp AS (SELECT qid, CAST(unnest(qe) AS DOUBLE) AS qv, unnest(range(len(qe))) AS pos FROM q),
qdist AS (
  SELECT qid, label, sum(CAST((qv - cv) * (qv - cv) AS DECIMAL(30,15))) AS d2
  FROM qexp JOIN cent USING (pos) GROUP BY qid, label
),
cell AS (
  SELECT qid, label FROM (
    SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY d2, label) AS rn
    FROM qdist
  ) WHERE rn <= {IVF_NPROBE}
),
cands AS (
  SELECT c.qid, e.vec_id AS cid, q.qe, e.embedding AS ce
  FROM cell c
  JOIN embeddings e ON e.label = c.label
  JOIN q ON q.qid = c.qid
  WHERE e.vec_id <> c.qid
),
prods AS (SELECT qid, cid, unnest(qe) AS qv, unnest(ce) AS cv FROM cands),
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
SELECT qid, cid, cosine, rnk FROM scored WHERE rnk <= {TOP_K} ORDER BY qid, rnk
""",
)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-label centroids are the coarse quantizer (inverted
    file cells); each query probes its `IVF_NPROBE` nearest cells (L2 to
    centroid) and exact-cosine reranks only inside those cells. Single-probe
    misses neighbors that sit just across a cell boundary — multi-probe is
    the standard IVF answer, trading a linear candidate-budget increase
    (nprobe/n_cells of the corpus) for boundary recall; the recall@k sweep
    lives in tests/test_ann_recall.py.

    Scale notes: the centroid table is tiny (n_cells rows) and broadcast;
    candidate scan is a co-partitioned equi join on the cell key, touching
    ~nprobe/n_cells of the corpus per query — the IVF contract. Everything
    is built-in HOFs (zip_with/aggregate); no Python in the hot path. At
    100 TB the cell key doubles as the table's partition key so a probe is
    partition-pruned I/O, not a full scan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk_frame(emb, nprobe=IVF_NPROBE)


def ivf_topk_frame(emb: DataFrame, nprobe: int = IVF_NPROBE) -> DataFrame:
    """Core of ivf_topk over any (vec_id, embedding, label) frame with a
    caller-chosen probe width — split out so the recall sweep can vary
    nprobe without re-registering queries."""
    # Coarse quantizer: elementwise mean per label, re-assembled to an array.
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("centroid")
        )
    )
    norm = F.sqrt(_dot_dec_col(F.col("embedding"), F.col("embedding")).cast("double"))
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), norm.alias("qnorm")
    )
    # Probe: nprobe nearest cells by L2^2 (decimal-rounded -> order-free).
    sq = F.zip_with(
        F.col("qe"),
        F.col("centroid"),
        lambda x, y: ((x.cast("double") - y) * (x.cast("double") - y)).cast(_DOT_DEC),
    )
    d2 = F.aggregate(sq, F.lit(0).cast(_ACC_DEC), lambda a, p: (a + p.cast(_ACC_DEC)).cast(_ACC_DEC))
    wq = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("label"))
    cell = (
        q.crossJoin(F.broadcast(cent))
        .select("qid", "qe", "qnorm", "label", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qe", "qnorm", "label")
    )
    # Rerank inside the probed cells only; cells partition the corpus by
    # label, so multi-probe candidates are disjoint — no dedup needed.
    # Candidate norms folded once per vector.
    cands = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
        norm.alias("cnorm"), "label",
    )
    joined = cands.join(F.broadcast(cell), "label").filter(F.col("cid") != F.col("qid"))
    dot = _dot_dec_col(F.col("qe"), F.col("ce"))
    cosine = dot.cast("double") / (F.col("qnorm") * F.col("cnorm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        joined.select("qid", "cid", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("qid", "rnk")
    )


# Deterministic "random" hyperplanes for LSH: signs derived from md5 of
# (plane, dim) — reproducible everywhere, no RNG state.
N_PLANES = 8


@query("ann_lsh_topk", tags=("similarity", "ann", "lsh"), oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection LSH: 8 deterministic ±1 hyperplanes
    -> 8-bit bucket; candidates share one of the query's probe buckets
    (multi-probe: the exact code plus its 8 Hamming-1 neighbors — a vector
    near a hyperplane lands one bit off, so probing flipped codes recovers
    most of single-probe's missed neighbors for a 9x candidate budget);
    exact cosine rerank inside the probed set.

    Scale notes: this is the 100 TB similarity path — bucketing is a
    per-row map, the probe expansion touches only the tiny query side, the
    join is equi-key on an 8-bit code, and the expensive exact rerank
    touches ~9/256 of the corpus per query. No oracle: LSH probing isn't
    expressible in plain SQL without replicating the plane table (the
    brute-force twin `embedding_topk_cosine` is the accuracy baseline; the
    recall test pins multi-probe >= single-probe).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk_frame(emb)


def lsh_topk_frame(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Core of ann_lsh_topk over any (vec_id, embedding) frame — split out
    so tests can plant known near-duplicates and pin recall in the regime
    LSH is built for (cosine >= ~0.9; on uniformly random vectors whose
    true neighbors sit at cosine ~0.5, sign-bucket collision is ~4% by
    construction and IVF is the right index instead)."""

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

    norm = F.sqrt(_dot_dec_col(F.col("embedding"), F.col("embedding")).cast("double"))
    coded = emb.select(
        "vec_id", "embedding", norm.alias("norm"), bucket(F.col("embedding")).alias("bucket")
    )
    # Multi-probe: explode each query into [exact code, 8 bit-flips].
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
            for p in range(N_PLANES)
        ],
    )
    q = coded.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
        F.explode(probes).alias("qbucket"),
    )
    cands = coded.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cnorm"),
        F.col("bucket").alias("cbucket"),
    )
    joined = cands.join(
        F.broadcast(q),
        (F.col("cbucket") == F.col("qbucket")) & (F.col("cid") != F.col("qid")),
    )
    dot = _dot_dec_col(F.col("qe"), F.col("ce"))
    cosine = dot.cast("double") / (F.col("qnorm") * F.col("cnorm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        joined.select("qid", "cid", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("qid", "rnk")
    )
