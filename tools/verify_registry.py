"""One-command t2-gate rehearsal: every oracle-expressible registry query
runs under a HOSTILE SparkSession (driver-like: foreign timezone, none of
the repo's session confs) and is hash-compared against its DuckDB oracle
at the driver's gate scale.

Usage:
    python tools/verify_registry.py [--sf-dir /root/testdata/sf0.01] \
        [--names substring_dedup_clean,dedup_clusters]

Exit code 0 iff every checked query matches. This is the scripted form of
the recipe in .claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="", help="comma-separated subset")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.testing.compare import (
        compare_with_oracle,
        duckdb_oracle,
    )

    con = duckdb_oracle(args.sf_dir)
    only = {n for n in args.names.split(",") if n} or None
    bad = ok = 0
    for name, q in sorted(all_queries().items()):
        if q.oracle is None or (only and name not in only):
            continue
        problems = compare_with_oracle(q.fn(spark, args.sf_dir), con, q.oracle)
        if problems:
            bad += 1
            print(f"{name} FAIL: {'; '.join(problems)}", flush=True)
        else:
            ok += 1
            print(f"{name} OK", flush=True)
    print(f"checked={ok + bad} ok={ok} failed={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
