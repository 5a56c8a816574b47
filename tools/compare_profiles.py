"""Cross-round result-hash drift check: compare the strict-harness hash
tables of two PROFILE_r*.md files, window-alias-adjusted.

The per-round profile records `testing/compare.result_hash` for every
registry query at sf0.01; identical hashes across rounds prove the code
churn of a round did not silently change any query's answer. Driver
window aliases (a5_*/a6_* prefixes from queries/registry.py rotations)
are stripped so a renamed query still lines up with its history.

Usage:
    python tools/compare_profiles.py PROFILE_r05.md PROFILE_r06.md

Exit code 1 if any common query's hash differs — each diff then needs a
root cause (a prescribed output change, a harness canonicalization
change) recorded in the newer profile, the way PROFILE_r06.md documents
its 11.
"""

from __future__ import annotations

import re
import sys

_ALIAS = re.compile(r"^a\d+_")


def load_hashes(path: str) -> dict[str, tuple[str, str]]:
    text = open(path).read()
    if "Strict-harness result hashes" not in text:
        raise SystemExit(f"{path}: no hash table section")
    table = text.split("Strict-harness result hashes")[1]
    out: dict[str, tuple[str, str]] = {}
    for m in re.finditer(r"\| (\S+) \| (\d+|None) \| (\w+|None) \|", table):
        out[_ALIAS.sub("", m.group(1))] = (m.group(2), m.group(3))
    return out


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = load_hashes(old_path), load_hashes(new_path)
    common = sorted(set(old) & set(new))
    drift = [n for n in common if old[n] != new[n]]
    print(
        f"{old_path}: {len(old)} queries; {new_path}: {len(new)}; "
        f"common (alias-adjusted): {len(common)}"
    )
    print(f"identical: {len(common) - len(drift)}; drifted: {len(drift)}")
    for n in drift:
        print(f"  DRIFT {n}: rows/hash {old[n]} -> {new[n]}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print("new queries:", ", ".join(added))
    if removed:
        print("removed queries:", ", ".join(removed))
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
