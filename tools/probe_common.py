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


def release_session_state(spark) -> None:
    """Between-measurement hygiene (the profile tool's r6 finding, now
    shared by the probes): accumulated localCheckpoint RDD blocks and
    per-round broadcast hash tables are only reclaimed by the
    ContextCleaner after a GC — without this, consecutive measurements on
    one session read 2-4x apart on identical code (r14 probe finding)."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def proc_tree_cpu_jiffies(root_pid: int) -> int:
    """Sum utime+stime (+cutime+cstime) jiffies over `root_pid` and every
    live descendant. cutime/cstime fold in each process's already-REAPED
    children (r14 review: a PySpark python worker that exits inside the
    measurement window vanishes from a live-only walk, and its CPU would
    be misattributed to FOREIGN load — the JVM reaps it, so its final
    jiffies land in the JVM's cutime and stay in the own-tree sum).
    RUSAGE_CHILDREN alone can't do this: it only covers children of the
    CALLING process, not the JVM's."""
    import os

    info: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as fh:
                s = fh.read()
        except OSError:
            continue  # raced a process exit
        rest = s[s.rindex(")") + 2 :].split()
        # fields after comm: state ppid ... utime(11) stime(12) cutime(13)
        # cstime(14) — cutime/cstime are reaped-children totals
        own = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        info[int(p)] = (int(rest[1]), own)
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in info.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0, [root_pid]
    while stack:
        pid = stack.pop()
        if pid in info:
            total += info[pid][1]
            stack.extend(kids.get(pid, ()))
    return total


def cpu_snapshot() -> tuple[int, int]:
    """(system busy jiffies, own process-tree jiffies)."""
    import os

    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    # busy = everything minus idle(3) + iowait(4); guest(8)/guest_nice(9)
    # are ALREADY folded into user/nice, so subtract them too or KVM-host
    # guest load double-counts and spuriously flags contention (r14
    # review; fields may be absent on old kernels). steal(7) is hypervisor
    # time taken by OTHER guests — it can never appear in the own process
    # tree, so counting it in busy misattributes host co-tenant pressure
    # to in-guest foreign processes (r15: observed ~1.2 "foreign" cores on
    # an otherwise idle guest under host steal). Exclude it; bench.py
    # records steal separately per run (host_steal_sys_s).
    busy = sum(vals) - vals[3] - vals[4]
    if len(vals) > 7:
        busy -= vals[7]
    if len(vals) > 9:
        busy -= vals[8] + vals[9]
    return busy, proc_tree_cpu_jiffies(os.getpid())


def foreign_cores(before: tuple[int, int], after: tuple[int, int], wall: float) -> float:
    """Average EXTERNAL cores busy during the window — contention
    evidence for a single-run measurement that cannot multi-run."""
    import os

    if wall <= 0:
        return 0.0
    hz = os.sysconf("SC_CLK_TCK")
    foreign = max(0, (after[0] - before[0]) - (after[1] - before[1])) / hz
    return foreign / wall
