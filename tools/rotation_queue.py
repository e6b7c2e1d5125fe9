"""Auto-derive the driver-window rotation queue (VERDICT r06 #7).

The round driver hash-checks only the first 50 registry entries
(DRIVER_WINDOW); every other query is verified by the repo's own
oracle suite but has never been witnessed by the driver. This tool
computes the NEVER-driver-verified set straight from the recorded
CORRECTNESS_r*.json files — no hand-maintained comment to drift
(r06's said ~35 when the true count was 52).

Usage:  python tools/rotation_queue.py          # print the queue
Import: never_driver_verified() → (oracle_backed, rows_only) lists.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_verified(repo_root: str = REPO) -> set[str]:
    """Names that appeared err-free in ANY round's correctness file."""
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name, res in data.items():
            if isinstance(res, dict) and not res.get("err"):
                seen.add(name)
    return seen


def never_driver_verified(repo_root: str = REPO) -> tuple[list[str], list[str]]:
    """(oracle_backed, rows_only) registry names no driver round has
    ever witnessed, in registry order."""
    sys.path.insert(0, repo_root)
    from walden_spark.registry import load_all

    reg = load_all()
    seen = driver_verified(repo_root)
    oracle_backed = [n for n, q in reg.items() if n not in seen and q.oracle]
    rows_only = [n for n, q in reg.items() if n not in seen and not q.oracle]
    return oracle_backed, rows_only


if __name__ == "__main__":
    ob, ro = never_driver_verified()
    print(f"# never driver-verified: {len(ob)} oracle-backed, {len(ro)} rows-only")
    print("# oracle-backed (rotate these into DRIVER_WINDOW first):")
    for n in ob:
        print(f"  {n}")
    print("# rows-only (weaker driver check by design):")
    for n in ro:
        print(f"  {n}")
