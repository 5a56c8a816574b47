#!/usr/bin/env python
"""Per-stage cost map for one registry query: run it once (noop sink,
warm second run optional) with the UI on, then dump every stage's task
time / shuffle bytes / callsite, sorted by task time. The measure step
of the guide §1 loop at stage granularity — bench.py's per-query stage
totals say WHICH query is expensive; this says WHERE inside it.

Usage:
    python tools/stage_profile.py --name near_dup_assignments [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from near_public_lakehouse_spark.queries import all_queries  # noqa: E402
from near_public_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="stage-profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[args.name]

    walls = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        if i < args.runs - 1:
            # everything before the LAST run is warmup; mark the boundary
            last_before = _stages(spark)
    before_ids = {s["stageId"] for s in last_before} if args.runs > 1 else set()

    stages = [s for s in _stages(spark) if s["stageId"] not in before_ids]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    total = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"walls={walls}  stages={len(stages)}  task_time={total / 1000:.1f}s")
    for s in stages[:40]:
        name = s.get("name", "?")
        print(
            f"  {s['stageId']:4d} {s.get('executorRunTime', 0) / 1000:7.2f}s"
            f" tasks={s.get('numTasks', 0):4d}"
            f" shR={s.get('shuffleReadBytes', 0) / 2**20:7.1f}MB"
            f" shW={s.get('shuffleWriteBytes', 0) / 2**20:7.1f}MB"
            f" in={s.get('inputBytes', 0) / 2**20:7.1f}MB  {name[:90]}"
        )


def _stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as resp:
        return json.loads(resp.read())


if __name__ == "__main__":
    main()
