#!/usr/bin/env python
"""Round-close gate runner: one command that produces every evidence
artifact a round's ROADMAP gates section quotes, so the paperwork can
never lag the code again (the round-10 lesson: a 78-minute round shipped
features but skipped PROFILE/COVERAGE/gates, and the judge had to settle
correctness from their own sweeps).

Runs, in order, each into its own log under .round_close/:

1. full pytest suite               -> suite.log        (gate: exit 0)
2. hostile-session oracle sweep    -> sweep.log        (gate: bad == 0)
   (driver-shaped SparkSession: local[8], non-UTC timezone, none of the
   engine factory's confs — the same recipe as .claude/skills/verify)
3. bench.py at sf0.1               -> bench.log + BENCH_LOCAL_r{N}.json
4. profile + compare vs an anchor  -> profile.log + PROFILE file
   (skipped unless --profile-anchor is given; the compare MUST be
   zero-drift or each diff needs a root cause in the profile doc)

Prints a ready-to-paste markdown gates block at the end and exits
non-zero if any gate fails. Usage:

    python tools/close_round.py --round 12 --profile-anchor PROFILE_r11.md
    python tools/close_round.py --round 12 --skip-suite   # re-run cheap gates
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SWEEP_SNIPPET = """
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[8]')
  .config('spark.sql.session.timeZone','America/New_York')
  .config('spark.ui.showConsoleProgress','false')
  .config('spark.ui.enabled','false').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import sys; sys.path.insert(0, {repo!r})
import __spark_entry__ as e
assert e.entry(spark).count() >= 0
from near_public_lakehouse_spark.testing.compare import duckdb_oracle, compare_with_oracle
from near_public_lakehouse_spark.queries import all_queries
con = duckdb_oracle('/root/testdata/sf0.01')
bad = ok = 0
for n, q in sorted(all_queries().items()):
    if q.oracle:
        r = compare_with_oracle(q.fn(spark, '/root/testdata/sf0.01'), con, q.oracle)
        if r:
            print(n, r, flush=True); bad += 1
        else:
            ok += 1
print('SWEEP DONE ok=', ok, 'bad=', bad)
"""


def _run(cmd: list[str], log: Path, env: dict | None = None) -> int:
    with open(log, "w") as f:
        return subprocess.run(
            cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT, env=env
        ).returncode


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--profile-anchor", default=None,
                    help="PROFILE_r*.md to compare the fresh profile against")
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    out = REPO / ".round_close"
    out.mkdir(exist_ok=True)
    gates: list[str] = []
    failed = False

    if not args.skip_suite:
        # `-o addopts=` clears pytest.ini's fast-lane `-m "not slow"`
        # filter: the round-close gate runs the FULL suite, both lanes
        # (r16 two-lane split — the driver's default invocation runs
        # only the fast lane so its gate completes in budget).
        rc = _run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-o", "addopts="],
            out / "suite.log",
        )
        lines = (out / "suite.log").read_text().strip().splitlines()
        tail = lines[-1] if lines else "suite produced no output — see suite.log"
        gates.append(f"- Suite: **{tail}** (exit {rc})")
        failed |= rc != 0

    rc = _run(
        [sys.executable, "-c", SWEEP_SNIPPET.format(repo=str(REPO))],
        out / "sweep.log",
    )
    sweep_tail = [
        l for l in (out / "sweep.log").read_text().splitlines() if "SWEEP DONE" in l
    ]
    line = sweep_tail[-1] if sweep_tail else "sweep crashed — see sweep.log"
    gates.append(f"- Hostile-session oracle sweep (sf0.01): **{line}**")
    failed |= rc != 0 or "bad= 0" not in line

    # Cross-engine differential fuzz gate (VERDICT r14 task #1): every
    # oracle pair on the seeded adversarial corpus AND the empty-fact-
    # table corpus must agree — the class of latent divergence three
    # straight rounds of hand review kept finding (NULL/zero-token text,
    # hostile JSON, boundary timestamps, zero vectors, empty partitions).
    rc = _run(
        [sys.executable, "tools/fuzz_oracle.py", "--variant", "both"],
        out / "fuzz.log",
    )
    fuzz_tail = [
        l for l in (out / "fuzz.log").read_text().splitlines() if "FUZZ DONE" in l
    ]
    line = fuzz_tail[-1] if fuzz_tail else "fuzz crashed — see fuzz.log"
    gates.append(f"- Differential fuzz (adversarial + empty corpora): **{line}**")
    failed |= rc != 0 or "findings=0" not in line

    if not args.skip_bench:
        import os

        env = dict(os.environ, SPARK_GRAFT_ROUND=str(args.round))
        rc = _run([sys.executable, "bench.py"], out / "bench.log", env=env)
        bench_file = REPO / f"BENCH_LOCAL_r{args.round:02d}.json"
        if bench_file.exists():
            import json

            d = json.loads(bench_file.read_text())
            total = d.get("value")
            core7 = d.get("core7_subtotal")
            ratio = (
                f"{core7 / 12.113:.2f}x" if isinstance(core7, (int, float)) else "?"
            )
            gates.append(
                f"- Bench (BENCH_LOCAL_r{args.round:02d}.json): total "
                f"{total} s, core7 **{core7} s** "
                f"(r1 anchor 12.113 s -> {ratio}), "
                f"contended: {sorted(d.get('contended', {}))}"
            )
            failed |= not isinstance(core7, (int, float))
        else:
            gates.append(
                f"- Bench: **BENCH_LOCAL_r{args.round:02d}.json missing** — see bench.log"
            )
        failed |= rc != 0

    if args.profile_anchor:
        prof = REPO / f"PROFILE_r{args.round:02d}.md"
        rc = _run(
            [sys.executable, "tools/profile_registry.py", "--out", str(prof)],
            out / "profile.log",
        )
        failed |= rc != 0
        cmp_log = out / "compare.log"
        rc = _run(
            [sys.executable, "tools/compare_profiles.py", args.profile_anchor, str(prof)],
            cmp_log,
        )
        cmp_text = cmp_log.read_text().strip()
        gates.append(
            f"- Profile drift gate vs {args.profile_anchor}:\n\n```\n{cmp_text}\n```"
        )
        m = re.search(r"drifted: (\d+)", cmp_text)
        failed |= rc != 0 or not m or m.group(1) != "0"

    print(f"\n### Round-{args.round} closing gates (tools/close_round.py)\n")
    print("\n".join(gates))
    print("\nGATES", "FAILED — fix before closing the round" if failed else "GREEN")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
