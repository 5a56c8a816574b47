#!/usr/bin/env python
"""Job/stage/task-time census for registry queries: run each with the
noop sink (warm runs), then report wall, #jobs, #stages, task-time and
shuffle bytes from the UI REST API. The driver-latency counterpart of
stage_profile.py — VERDICT r15 items 3/6 are job-count targets, so the
measure loop needs the job count as a first-class number.

Usage:
    python tools/jobs_profile.py --names link_analysis_hits,sa_longest_dup_span \
        [--runs 2] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import gc
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


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    queries = all_queries()
    spark = get_spark(
        app_name="jobs_profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedJobs": "10000",
            "spark.ui.retainedStages": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names.split(","):
        q = queries[name]
        for run_i in range(args.runs):
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            jobs0 = {j["jobId"] for j in _api(spark, "jobs")}
            stages0 = {s["stageId"] for s in _api(spark, "stages")}
            spark.sparkContext.setJobDescription(f"{name} run {run_i}")
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs1 = [j for j in _api(spark, "jobs") if j["jobId"] not in jobs0]
            stages1 = [s for s in _api(spark, "stages") if s["stageId"] not in stages0]
            task_time = sum(s.get("executorRunTime", 0) for s in stages1) / 1000.0
            cpu_time = sum(s.get("executorCpuTime", 0) for s in stages1) / 1e9
            sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages1) / 2**20
            print(
                f"{name} run{run_i}: wall={wall:.2f}s jobs={len(jobs1)} "
                f"stages={len(stages1)} task_time={task_time:.1f}s "
                f"cpu={cpu_time:.1f}s shuffle_write={sh_w:.1f}MB",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
