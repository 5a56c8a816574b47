#!/usr/bin/env python
"""Time individual registry queries in isolation with the noop sink.

Usage:
    python tools/bench_isolate.py --names graph_pagerank,near_dup_assignments \
        [--runs 3] [--sf-dir /root/testdata/sf0.1]

Methodology matches bench.py (guide §1.4): each run executes the full
pipeline into `format("noop")`, GC between runs (the round-6 session-state
finding), per-run walls + min/median printed. Used for the tight
measure -> change -> re-measure loop during optimization rounds without
paying for the full bench suite each iteration.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from near_public_lakehouse_spark.queries import all_queries  # noqa: E402
from near_public_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    spark = get_spark(app_name="bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        walls = []
        for i in range(args.runs):
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"isolate:{name}:run{i}")
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        s = sorted(walls)
        out[name] = {
            "runs": walls,
            "min": s[0],
            "median": s[len(s) // 2] if len(s) % 2 else round((s[len(s) // 2 - 1] + s[len(s) // 2]) / 2, 3),
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
