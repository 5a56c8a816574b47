#!/usr/bin/env python
"""Regenerate ROTATION_HISTORY.json — the machine-readable record of the
driver-window rotation aliases (rounds 5-7), so the alias-adjusted union
of CORRECTNESS_r*.json files can be computed without reading prose.

Source of truth is the CORRECTNESS files themselves: every aN_-prefixed
key that ever appeared in a driver record is an alias of the organic name
obtained by stripping the prefix (the only renaming rule ever used; see
`queries/registry.py::_ALIAS_RE`). Run from the repo root:

    python tools/rotation_history.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ALIAS_RE = re.compile(r"^(a\d+)_(.+)$")
REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    rounds: dict[str, dict[str, str]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = path.stem.split("_")[-1]  # r05, r06, ...
        aliases = {
            key: m.group(2)
            for key in json.loads(path.read_text())
            if (m := ALIAS_RE.match(key))
        }
        if aliases:
            rounds[rnd] = dict(sorted(aliases.items()))
    # Fold in the LIVE rotation from the registry: the driver writes
    # CORRECTNESS_r{N}.json only after the round closes, so an active
    # rotation would otherwise be invisible here until round N+1 — the
    # exact r13 bookkeeping gap VERDICT r14 task #2 says not to repeat.
    # The alias prefix names the round (a15_ -> r15).
    import sys

    sys.path.insert(0, str(REPO))
    from near_public_lakehouse_spark.queries.registry import (
        DRIVER_WINDOW_ROTATION,
    )

    live: dict[str, dict[str, str]] = {}
    for organic, alias in DRIVER_WINDOW_ROTATION.items():
        m = ALIAS_RE.match(alias)
        if m:
            live.setdefault("r" + m.group(1)[1:].zfill(2), {})[alias] = organic
    for rnd, aliases in live.items():
        merged = {**rounds.get(rnd, {}), **aliases}
        rounds[rnd] = dict(sorted(merged.items()))
    rounds = dict(sorted(rounds.items()))
    out = {
        "rule": "a<N>_<name> is an alias of <name>; union coverage across "
        "rounds is computed alias-adjusted (strip the a<N>_ prefix)",
        "retired_in": "r08 (all aliases driver-green by CORRECTNESS_r07; "
        "queries register under organic names from round 8 on)",
        "reactivated_in": "r09 (VERDICT r8 task #1: the six never-driver-"
        "checked r7/r8 queries — retrieval x4, link_analysis_hits, "
        "quality_outliers_mad — rotate into the window under a9_ aliases); "
        "standing rule since r10 (VERDICT r9 task #1): a query added in "
        "round N rotates into the window in round N",
        "rounds": rounds,
    }
    (REPO / "ROTATION_HISTORY.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote ROTATION_HISTORY.json: {sum(len(v) for v in rounds.values())} aliases over {len(rounds)} rounds")


if __name__ == "__main__":
    main()
