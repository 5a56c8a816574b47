"""Adversarial-skew corpus generator for the dedup pipeline probes
(VERDICT r11 task #5).

SCALE.md pins linear candidate growth for the SHIPPED corpus mix; this
module builds the corpus mix that is deliberately hostile to the
MinHash/LSH candidate stage: one pathological source holding `hot_frac`
(default 90%) of all documents whose signatures collide en masse, so the
band keys / signature-group keys of that source are the hottest keys the
pipeline can ever see. Two regimes isolate the two collision mechanisms:

- ``identical``: every hot doc has the SAME token set (so the SAME
  12-minhash signature -> one (source, signature) group) but a distinct
  raw text (so exact-fingerprint election collapses nothing). This is the
  regime the signature-group compression (`_adaptive_pairs` step 2) must
  collapse: the quadratic band self-join sees ONE representative.

- ``near``: every hot doc replaces one base token with a doc-unique
  token. Token sets are pairwise >= 0.90 Jaccard (true near-dups), but
  signatures split into many distinct values that still share band keys —
  the hot-BAND-key regime, where group compression cannot help and the
  enumeration mass is genuinely quadratic in the hot-source size.

Cold docs (the other 10%) have doc-unique token sets spread over three
normal sources — zero collisions, they exist so source calibration sees
a realistic multi-source corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_K = 40  # hot-doc base vocabulary size
COLD_K = 10  # unique tokens per cold doc


def skewed_corpus(
    spark: SparkSession,
    n_docs: int,
    regime: str,
    hot_frac: float = 0.9,
    k: int = BASE_K,
) -> DataFrame:
    """(doc_id BIGINT, text STRING, source STRING) with a `hot_frac`-share
    pathological source per the module docstring. Deterministic (pure
    function of doc_id); `identical` texts are distinct for
    n_docs < k**3 = 64000."""
    if regime not in ("identical", "near"):
        raise ValueError(f"unknown regime {regime!r}")
    n_hot = int(n_docs * hot_frac)
    base_arr = F.array(*[F.lit(f"w{j:03d}") for j in range(k)])
    i = F.col("id")
    if regime == "identical":
        # Append 3 DUPLICATE base tokens chosen by the base-k digits of
        # doc_id: raw text distinct per doc, token SET (array_distinct)
        # identical to the base set -> identical signature for all.
        extra = F.array(
            *[
                F.element_at(base_arr, ((i / (k**d)).cast("int") % k) + 1)
                for d in range(3)
            ]
        )
        hot_toks = F.concat(base_arr, extra)
    else:
        # Replace the (doc_id % k)-th base token with a doc-unique token:
        # pairwise Jaccard >= (k-2)/(k+2) ~= 0.90 >= VERIFY_JACCARD, so
        # the whole hot source is ONE true near-dup family, but the
        # signatures fan out while still colliding on most band keys.
        hot_toks = F.transform(
            base_arr,
            lambda t, j: F.when(
                j == (i % k).cast("int"),
                F.concat(F.lit("u"), i.cast("string")),
            ).otherwise(t),
        )
    cold_toks = F.array(
        *[F.concat(F.lit(f"c{j}x"), i.cast("string")) for j in range(COLD_K)]
    )
    is_hot = i < n_hot
    # nullif: relax nullability to match a parquet-read frame (never fires —
    # ids are >= 0, texts/sources non-empty). spark.range's NON-NULLABLE
    # attrs otherwise feed Catalyst's Union constraint propagation a
    # constraint set it crashes on (`rewriteConstraints` NoSuchElementException
    # inside `_star_cc`'s union loop on Spark 4.1) — a planner bug the real
    # tables never hit because parquet columns are nullable.
    return spark.range(n_docs).select(
        F.nullif(i, F.lit(-1)).alias("doc_id"),
        F.nullif(
            F.concat_ws(" ", F.when(is_hot, hot_toks).otherwise(cold_toks)),
            F.lit(""),
        ).alias("text"),
        F.nullif(
            F.when(is_hot, F.lit("hotsrc")).otherwise(
                F.concat(F.lit("src"), (i % 3).cast("string"))
            ),
            F.lit(""),
        ).alias("source"),
    )


def skewed_graph(
    spark: SparkSession, n_pairs: int, hot_frac: float = 0.9, n_cold_supp: int = 50
) -> DataFrame:
    """Power-law bipartite customer-supplier edge list for the graph-trio
    skew probes (VERDICT r12 task #4): `hot_frac` of all (customer,
    supplier) pairs name ONE supplier ('S0' — the one-supplier-on-90%-of-
    lineitems case TPC-H's uniform generator never produces), the rest
    spread over `n_cold_supp` cold suppliers. Output matches the shape
    the production edge build emits AFTER its pair-count aggregate
    (`graph_pagerank`'s `pairs`): (a, b, w) with distinct pairs, so the
    probes exercise the per-round join-aggregate — the stage with the hot
    key — not the skew-safe (partial-aggregated) build. Deterministic
    (pure function of the pair index)."""
    n_hot = int(n_pairs * hot_frac)
    i = F.col("id")
    # nullif: same nullability relaxation as skewed_corpus (Catalyst's
    # Union constraint propagation chokes on non-nullable range attrs).
    return spark.range(n_pairs).select(
        F.nullif(F.concat(F.lit("C"), i.cast("string")), F.lit("")).alias("a"),
        F.nullif(
            F.when(i < n_hot, F.lit("S0")).otherwise(
                F.concat(F.lit("S"), (F.lit(1) + i % n_cold_supp).cast("string"))
            ),
            F.lit(""),
        ).alias("b"),
        (F.lit(1.0) + (i % 3).cast("double")).alias("w"),
    )
