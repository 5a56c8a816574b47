"""Shared helpers for the adversarial-skew probe tools
(skew_probe_dedup.py, skew_probe_graph.py): Spark REST-API stage/task
scraping for straggler evidence. Extracted r13 — the two probes carried
verbatim copies and a fix to one would silently miss the other."""

from __future__ import annotations

import json
import urllib.request


def stage_ids(spark) -> set[int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages", timeout=5
        ) as r:
            return {s["stageId"] for s in json.loads(r.read())}
    except Exception:
        return set()


def max_task_ms(spark, before: set[int]) -> tuple[float, float]:
    """(max single-task ms, total task ms) across stages run since
    `before` — the straggler evidence: a hot key serialized into one task
    shows up as max ~= wall regardless of task count."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    mx = tot = 0.0
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages", timeout=5
        ) as r:
            stages = json.loads(r.read())
    except Exception:
        return (0.0, 0.0)
    for s in stages:
        if s["stageId"] in before or s.get("status") not in ("COMPLETE", "ACTIVE"):
            continue
        tot += s.get("executorRunTime", 0)
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                f"{s.get('attemptId', 0)}/taskSummary?quantiles=1.0",
                timeout=5,
            ) as r:
                summ = json.loads(r.read())
            mx = max(mx, float(summ.get("executorRunTime", [0.0])[0]))
        except Exception:
            pass
    return (mx, tot)
