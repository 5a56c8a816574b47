"""Reproduce SCALE.md's 10x scale probe for the iterative queries.

Builds a 10x replica of the sf0.1 `documents` corpus with token-disjoint
replicas (every token prefixed with its replica tag, so duplicate-family
COUNT grows 10x while family SIZE stays constant — the realistic shape of
a larger corpus) plus a 10x id-offset `embeddings` replica, then times the
iterative queries at 1x and 10x.

Usage:
    python tools/scale_probe.py [--probe-dir /tmp/sfprobe] [--factor 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--probe-dir", default="/tmp/sfprobe")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--queries",
        default="dedup_clusters,near_dup_assignments,kmeans_clusters",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.session import get_spark
    from near_public_lakehouse_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    reps = spark.range(args.factor).select(F.col("id").alias("rep"))

    docs = load_table(spark, args.sf_dir, "documents")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
            "lang",
            "source",
            "n_chars",
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(
                            F.lit("r"), F.col("rep").cast("string"), t
                        ),
                    ),
                )
            )
            .alias("text"),
        )
        .write.mode("overwrite")
        .parquet(f"{args.probe_dir}/documents.parquet")
    )

    emb = load_table(spark, args.sf_dir, "embeddings")
    max_emb = emb.agg(F.max("vec_id")).first()[0] + 1
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * max_emb).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{args.probe_dir}/embeddings.parquet")
    )

    q = all_queries()
    for name in args.queries.split(","):
        for sf_dir, tag in ((args.sf_dir, "1x"), (args.probe_dir, f"{args.factor}x")):
            t0 = time.perf_counter()
            q[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"{name} {tag} {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
