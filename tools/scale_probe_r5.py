"""Round-5 scale probes behind SCALE.md (VERDICT r4 asks #6-#8).

Three reproducible measurements, each printing table-ready rows:

  publication  - the bronze -> change-feed tail -> hourly avro export path
                 at 1x and 10x event volume: is every stage linear, and is
                 the no-op re-tail (closed commits) O(manifests), not
                 O(data)?
  ann          - recall@5 of the ANN operators (LSH multi-probe, IVF
                 nprobe sweep, PQ rerank budget) against brute-force
                 ground truth on the 10x embeddings replica built by
                 tools/scale_probe.py: do the shipped knobs hold at 10x N?
  scd2         - bucketed SCD2 rewrite stress: a change stream of small
                 batches against a 50k-key bucketed dimension, recording
                 rewritten-bytes vs table-bytes per batch (should track
                 the touched-BUCKET fraction, never 100%), with the
                 unbucketed apply as the contrast.

Usage:
    python tools/scale_probe.py            # builds /tmp/sfprobe (10x replicas)
    python tools/scale_probe_r5.py publication|ann|scd2 [--probe-dir /tmp/sfprobe]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def _spark():
    from near_public_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# ---------------------------------------------------------------------------
# publication path


def probe_publication(args) -> None:
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.operators.export import export_closed_hours
    from near_public_lakehouse_spark.operators.versioned import (
        commit_append,
        latest_version,
        read_version,
        tail_until_drained,
    )

    spark = _spark()
    ns_h = 3_600 * 1_000_000_000
    h0 = 490_000
    hours = 48

    for factor, n_rows in ((1, args.pub_rows), (args.factor, args.pub_rows * args.factor)):
        base = os.path.join(args.work_dir, f"pub{factor}x")
        bronze, silver, pub = (os.path.join(base, d) for d in ("bronze", "silver", "pub"))
        # spread rows uniformly over EXACTLY `hours` hours at every scale,
        # so 1x and 10x compare the same hour count with 10x rows/hour.
        events = spark.range(n_rows).select(
            F.col("id").alias("event_id"),
            (
                F.lit(h0) * ns_h
                + (F.col("id") * hours * 3600 / n_rows).cast("long") * 1_000_000_000
            ).alias("ts"),
            F.when(F.col("id") % 3 == 0, "view").otherwise("click").alias("event_type"),
        )
        t0 = time.perf_counter()
        commit_append(events.filter(F.col("event_id") % 2 == 0), bronze)
        commit_append(events.filter(F.col("event_id") % 2 == 1), bronze)
        t_bronze = time.perf_counter() - t0

        t0 = time.perf_counter()
        tail_until_drained(spark, bronze, silver, max_versions_per_batch=1)
        t_tail = time.perf_counter() - t0

        # no-op re-tail: closed commits must NOT be re-read (O(manifest))
        t0 = time.perf_counter()
        tail_until_drained(spark, bronze, silver, max_versions_per_batch=1)
        t_noop = time.perf_counter() - t0

        silver_df = read_version(spark, silver, latest_version(silver))
        now = datetime.fromtimestamp((h0 + hours + 2) * 3600, tz=timezone.utc).replace(
            tzinfo=None
        )
        t0 = time.perf_counter()
        written = export_closed_hours(silver_df, pub, "events", "ts", now)
        t_export = time.perf_counter() - t0

        # marker fencing: a rerun must write zero hours, in marker-check time
        t0 = time.perf_counter()
        rerun = export_closed_hours(silver_df, pub, "events", "ts", now)
        t_reexport = time.perf_counter() - t0
        assert rerun == [], f"marker fencing failed: {len(rerun)} hours rewritten"

        n_avro = sum(
            1
            for p in written
            for f in os.listdir(p)
            if f.endswith(".avro")
        )
        avro_bytes = sum(
            os.path.getsize(os.path.join(p, f))
            for p in written
            for f in os.listdir(p)
            if f.endswith(".avro")
        )
        print(
            f"publication {factor}x rows={n_rows} bronze={t_bronze:.2f}s "
            f"tail={t_tail:.2f}s noop_retail={t_noop:.2f}s "
            f"export={t_export:.2f}s noop_reexport={t_reexport:.2f}s "
            f"hours={len(written)} files={n_avro} "
            f"avro_mb={avro_bytes / 1e6:.1f}",
            flush=True,
        )


# ---------------------------------------------------------------------------
# ANN recall at 10x


def probe_ann(args) -> None:
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries.similarity import (
        TOP_K,
        embedding_topk_frame,
        ivf_topk_frame,
        lsh_topk_frame,
        pq_topk_frame,
    )

    spark = _spark()
    emb = spark.read.parquet(os.path.join(args.probe_dir, "embeddings.parquet"))
    n = emb.count()

    def truth():
        out = {}
        for r in embedding_topk_frame(emb).collect():
            out.setdefault(r.qid, set()).add(r.cid)
        return out

    t0 = time.perf_counter()
    gt = truth()
    t_bf = time.perf_counter() - t0

    def recall(frame, qcol="qid", ccol="cid") -> float:
        got: dict = {}
        for r in frame.collect():
            got.setdefault(r[qcol], set()).add(r[ccol])
        hits = sum(len(got.get(q, set()) & cs) for q, cs in gt.items())
        return hits / sum(len(cs) for cs in gt.values())

    t0 = time.perf_counter()
    r_lsh = recall(lsh_topk_frame(emb))
    t_lsh = time.perf_counter() - t0
    print(
        f"ann n={n} brute_force={t_bf:.2f}s | lsh_multiprobe recall@{TOP_K}="
        f"{r_lsh:.2f} {t_lsh:.2f}s",
        flush=True,
    )
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        r = recall(ivf_topk_frame(emb, nprobe=nprobe))
        print(
            f"ann ivf nprobe={nprobe} recall@{TOP_K}={r:.2f} "
            f"{time.perf_counter() - t0:.2f}s",
            flush=True,
        )
    t0 = time.perf_counter()
    r_pq = recall(pq_topk_frame(emb))
    print(
        f"ann pq rerank=default recall@{TOP_K}={r_pq:.2f} "
        f"{time.perf_counter() - t0:.2f}s",
        flush=True,
    )


# ---------------------------------------------------------------------------
# SCD2 bucketed rewrite stress


def _tree_bytes(root: str) -> dict[str, tuple[int, int]]:
    """{relpath: (size, mtime_ns)} for every parquet file under root."""
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def probe_scd2(args) -> None:
    from near_public_lakehouse_spark.operators.scd import apply_changes_scd2

    spark = _spark()
    n_keys = args.scd2_keys
    n_buckets = args.scd2_buckets
    batch_keys = args.scd2_batch_keys

    for nb, tag in ((n_buckets, f"bucketed[{n_buckets}]"), (None, "unbucketed")):
        target = os.path.join(args.work_dir, f"scd2_{'b' if nb else 'flat'}")
        init = spark.range(n_keys).selectExpr(
            "cast(id as int) k", "concat('v', id % 7) v", "10 as seq"
        )
        apply_changes_scd2(spark, target, init, ["k"], "seq", n_buckets=nb)
        before = _tree_bytes(target)
        table_bytes = sum(s for s, _ in before.values())

        total_rewritten = 0
        t0 = time.perf_counter()
        for b in range(args.scd2_batches):
            # each batch touches batch_keys spread keys (deterministic)
            upd = spark.range(batch_keys).selectExpr(
                f"cast(id * {n_keys // batch_keys} + {b} as int) k",
                f"concat('w', {b}) v",
                f"{20 + b} as seq",
            )
            apply_changes_scd2(spark, target, upd, ["k"], "seq", n_buckets=nb)
            after = _tree_bytes(target)
            rewritten = sum(
                s
                for rel, (s, mt) in after.items()
                if rel not in before or before[rel][1] != mt
            )
            total_rewritten += rewritten
            before = after
        dt = time.perf_counter() - t0
        final_bytes = sum(s for s, _ in before.values())
        frac = total_rewritten / max(final_bytes, 1)
        print(
            f"scd2 {tag} keys={n_keys} batches={args.scd2_batches}x{batch_keys}keys "
            f"table_mb={table_bytes / 1e6:.1f} rewritten_mb={total_rewritten / 1e6:.1f} "
            f"rewritten/table={frac:.2f} apply_total={dt:.1f}s",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["publication", "ann", "scd2"])
    ap.add_argument("--probe-dir", default="/tmp/sfprobe")
    ap.add_argument("--work-dir", default="/tmp/sfprobe_r5")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--pub-rows", type=int, default=50_000)
    ap.add_argument("--scd2-keys", type=int, default=50_000)
    ap.add_argument("--scd2-buckets", type=int, default=256)
    ap.add_argument("--scd2-batch-keys", type=int, default=25)
    ap.add_argument("--scd2-batches", type=int, default=5)
    args = ap.parse_args()
    {"publication": probe_publication, "ann": probe_ann, "scd2": probe_scd2}[args.mode](
        args
    )


if __name__ == "__main__":
    main()
