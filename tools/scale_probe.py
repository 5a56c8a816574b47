"""Reproduce SCALE.md's 10x scale probe for the iterative queries.

Builds a 10x replica of the sf0.1 `documents` corpus with token-disjoint
replicas (every token prefixed with its replica tag, so duplicate-family
COUNT grows 10x while family SIZE stays constant — the realistic shape of
a larger corpus) plus a 10x id-offset `embeddings` replica, then times the
iterative queries at 1x and 10x.

Usage:
    python tools/scale_probe.py [--probe-dir /tmp/sfprobe] [--factor 10]
    python tools/scale_probe.py --mode neardup_candidates   # r10 task #6a
    python tools/scale_probe.py --mode delta_sync           # r10 task #6b
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def _neardup_candidates(args) -> None:
    """VERDICT r10 task #6a: per-source candidate growth of the adaptive
    near_dup candidate stage at 10x docs — must be ~linear per source
    (token-disjoint replicas multiply family COUNT, not family size, so
    a quadratic stage would show ~100x pairs)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries.adaptive_lsh import _adaptive_pairs
    from near_public_lakehouse_spark.queries.dedup import _dtoks_col, load_table
    from near_public_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir, tag in ((args.sf_dir, "1x"), (args.probe_dir, f"{args.factor}x")):
        docs = load_table(spark, sf_dir, "documents")
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        f = docs.repartition(n_part).select(
            "doc_id",
            "text",
            "source",
            F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
            _dtoks_col().alias("toks"),
        )
        fam = f.withColumn(
            "keeper", F.min("doc_id").over(W.partitionBy("fingerprint"))
        ).localCheckpoint()
        reps = (
            fam.filter(F.col("doc_id") == F.col("keeper"))
            .select("doc_id", "text", "source", "toks")
            .localCheckpoint()
        )
        t0 = time.perf_counter()
        cand = _adaptive_pairs(reps).localCheckpoint()
        wall = time.perf_counter() - t0
        src = reps.select(F.col("doc_id").alias("doc_a"), "source")
        per_source = {
            r.source: r.n
            for r in cand.join(src, "doc_a")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(per_source.values())
        print(
            f"neardup_candidates {tag}: reps={reps.count()} pairs={total} "
            f"wall={wall:.2f}s per_source={dict(sorted(per_source.items()))}",
            flush=True,
        )


def _delta_sync(args) -> None:
    """VERDICT r10 task #6b: sync_delta_log_from_dir per-publish cost at
    10x files per partition — the touched-partition walk must stay
    O(touched files) while the full walk grows with the table."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )

    schema_json = (
        '{"type":"struct","fields":['
        '{"name":"v","type":"long","nullable":true,"metadata":{}},'
        '{"name":"day","type":"string","nullable":true,"metadata":{}}]}'
    )
    tbl = pa.table({"v": [1]})

    for files_per_part, tag in ((20, "1x"), (20 * args.factor, f"{args.factor}x")):
        root = os.path.join(args.probe_dir, f"delta_sync_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        n_parts = 50
        for p in range(n_parts):
            d = os.path.join(root, f"day=2024-{p // 28 + 1:02d}-{p % 28 + 1:02d}")
            os.makedirs(d)
            # the TOUCHED partition (2024-01-01, p=0) keeps a constant 20
            # files at both scales — only the rest of the table grows, so
            # the touched-walk timing isolates O(touched) from O(table)
            for i in range(20 if p == 0 else files_per_part):
                pq.write_table(tbl, os.path.join(d, f"part-{i:05d}.parquet"))
        t0 = time.perf_counter()
        sync_delta_log_from_dir(root, schema_json, ["day"])  # v0 full walk
        t_v0 = time.perf_counter() - t0

        touched = "2024-01-01"
        # drive the log past the 10-commit checkpoint cadence so the
        # steady-state measurement includes the checkpoint-seeded replay
        # (daily publishes live past v10 forever)
        for i in range(10):
            pq.write_table(
                tbl, os.path.join(root, f"day={touched}", f"part-w{i}.parquet")
            )
            sync_delta_log_from_dir(
                root, schema_json, ["day"], touched_partitions=[touched]
            )

        pq.write_table(
            tbl, os.path.join(root, f"day={touched}", "part-new.parquet")
        )
        t0 = time.perf_counter()
        sync_delta_log_from_dir(
            root, schema_json, ["day"], touched_partitions=[touched]
        )
        t_touch = time.perf_counter() - t0

        pq.write_table(
            tbl, os.path.join(root, "day=2024-01-02", "part-new.parquet")
        )
        t0 = time.perf_counter()
        sync_delta_log_from_dir(root, schema_json, ["day"])  # full walk diff
        t_full = time.perf_counter() - t0
        print(
            f"delta_sync {tag}: files={n_parts * files_per_part} "
            f"v0_full={t_v0:.2f}s touched_walk_post_ckpt={t_touch:.3f}s "
            f"full_walk_diff={t_full:.2f}s",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--probe-dir", default="/tmp/sfprobe")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--mode",
        default="queries",
        choices=["queries", "neardup_candidates", "delta_sync"],
    )
    ap.add_argument(
        "--queries",
        default="dedup_clusters,near_dup_assignments,kmeans_clusters",
    )
    args = ap.parse_args()
    if args.mode == "delta_sync":
        _delta_sync(args)
        return
    if args.mode == "neardup_candidates":
        _neardup_candidates(args)
        return

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
