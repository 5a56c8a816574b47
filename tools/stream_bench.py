#!/usr/bin/env python
"""Streaming micro-bench (r16, VERDICT r15 item 7): a timed availableNow
surface for the streaming operators, so "trigger-bound, left alone"
claims carry a number instead of an assertion. NOT part of bench.py's
driver contract — a separate committed record
(`STREAM_BENCH_LOCAL_r{N}.json`) next to the BENCH_LOCAL twins.

Each job drains the sf0.01 events fixture end to end with
trigger(availableNow) into a memory sink (or the SCD1 table upsert),
with a FRESH checkpoint per run — no cross-run state reuse; every run
recomputes from the parquet input. Median of --runs, per-run walls kept.

Jobs:
  sessionizer      user_sessions_stateful (applyInPandasWithState)
  session_window   session_event_stats (the built-in twin)
  dedup_twin       deduped_events (dropDuplicatesWithinWatermark)
  scd1_stream      apply_changes_stream upserting (user_id, ts) changes

Usage:
    python tools/stream_bench.py [--runs 3] [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from near_public_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="stream_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from near_public_lakehouse_spark.operators.scd import apply_changes_stream
    from near_public_lakehouse_spark.streaming import jobs

    events_path = os.path.join(args.sf_dir, "events.parquet")

    def sessionizer(ck: str, out: str) -> None:
        ev = jobs.read_events_stream(spark, events_path)
        jobs.run_to_memory(
            jobs.user_sessions_stateful(ev, gap_minutes=240, watermark="1 day"),
            out,
            ck,
        )

    def session_window(ck: str, out: str) -> None:
        ev = jobs.read_events_stream(spark, events_path)
        jobs.run_to_memory(
            jobs.session_event_stats(ev, gap="4 hours", watermark="1 day"), out, ck
        )

    def dedup_twin(ck: str, out: str) -> None:
        ev = jobs.read_events_stream(spark, events_path)
        jobs.run_to_memory(jobs.deduped_events(ev, watermark="2 hours"), out, ck)

    def scd1_stream(ck: str, out: str) -> None:
        ev = jobs.read_events_stream(spark, events_path)
        target = os.path.join(os.path.dirname(ck), f"scd1_{out}")
        q = apply_changes_stream(
            ev.select("user_id", "ts", "event_type", "value"),
            target,
            keys=["user_id"],
            sequence_by="ts",
            checkpoint=ck,
        )
        q.awaitTermination()

    bench = {
        "sessionizer": sessionizer,
        "session_window": session_window,
        "dedup_twin": dedup_twin,
        "scd1_stream": scd1_stream,
    }
    tmp = tempfile.mkdtemp(prefix="stream_bench_")
    runs: dict[str, list[float]] = {}
    try:
        for run_i in range(args.runs):
            for name, fn in bench.items():
                gc.collect()
                ck = os.path.join(tmp, f"{name}_r{run_i}_ck")
                t0 = time.perf_counter()
                fn(ck, f"{name}_r{run_i}")
                runs.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3)
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)

    record = {
        "metric": "streaming_availablenow_runtime",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "jobs": {n: median(xs) for n, xs in runs.items()},
        "runs": runs,
        "value": round(sum(median(xs) for xs in runs.values()), 3),
    }
    line = json.dumps(record)
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        recorded = [
            int(m.group(1))
            for f in Path(_REPO).glob("BENCH_r*.json")
            if (m := re.match(r"BENCH_r(\d+)\.json$", f.name))
        ]
        rnd = f"{max(recorded, default=0) + 1:02d}"
    (Path(_REPO) / f"STREAM_BENCH_LOCAL_r{int(rnd):02d}.json").write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
