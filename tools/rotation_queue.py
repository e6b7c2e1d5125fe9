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


def latest_full_green(repo_root: str = REPO) -> dict[str, int]:
    """name → newest round with a FULL-green (rows+schema+hash) driver
    witness, replayed from every CORRECTNESS_r*.json. Names with no
    full-green witness ever are absent."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        try:
            data = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name, res in data.items():
            if (
                isinstance(res, dict)
                and not res.get("err")
                and res.get("rows_match") is True
                and res.get("schema_match") is True
                and res.get("hash_match") is True
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def stalest_witness(repo_root: str = REPO) -> tuple[int, list[str]]:
    """(round, names) of the stalest full-green driver witness across
    the registry — the DERIVED claim the round notes must quote
    (VERDICT r13 "What's wrong" #1: the r13 notes hand-wrote "stalest
    is r06" while win_groups_frame_partitioned's latest witness was
    r05). Never-witnessed names count as round 0."""
    sys.path.insert(0, repo_root)
    from walden_spark.registry import load_all

    latest = latest_full_green(repo_root)
    reg = load_all()
    by_round: dict[int, list[str]] = {}
    for n in reg:
        by_round.setdefault(latest.get(n, 0), []).append(n)
    stalest = min(by_round)
    return stalest, by_round[stalest]


def window_guard_violations(
    window, window_round: int, repo_root: str = REPO
) -> list[str]:
    """Three-state rotation drift guard (VERDICT r06 #7 / r07 / r08 #2),
    keyed on ``window_round`` vs the newest CORRECTNESS_r*.json round.
    Returns a list of human-readable violations (empty = green):

    * window round > newest file round (mid-round, window rotated): the
      window must hold at least min(37, len(queue)) of the
      never-driver-verified oracle-backed names — the r06 tripwire.
    * window round == newest file round (handover boundary: the driver
      just landed THIS window's results): require the window FULLY
      green in its own round's file — ``rows_match and schema_match
      and hash_match`` all true, not merely err-free (the r08 arm
      accepted a hash-mismatched entry, the exact failure the guard
      exists to catch — VERDICT r08 #2).
    * window round < newest file round: more than one rotation behind —
      hard fail, rotate now.
    """
    rounds = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rounds[int(f.rsplit("_r", 1)[1].split(".")[0])] = f
    if not rounds:
        return []
    newest = max(rounds)

    if window_round < newest:
        return [
            f"DRIVER_WINDOW was cut for round {window_round} but "
            f"CORRECTNESS_r{newest:02d}.json exists — the window is more "
            "than one rotation behind; regenerate via "
            "python tools/rotation_queue.py"
        ]
    if window_round > newest:
        oracle_backed, _rows_only = never_driver_verified(repo_root)
        in_window = [n for n in oracle_backed if n in window]
        if len(in_window) < min(37, len(oracle_backed)):
            return [
                f"DRIVER_WINDOW rotates only {len(in_window)} of "
                f"{len(oracle_backed)} never-driver-verified oracle-backed "
                "names; regenerate via python tools/rotation_queue.py"
            ]
        # Drain-the-tail arm (VERDICT r13 #2): the names tied at the
        # registry-wide stalest witness round must be in the freshly
        # cut window (when they fit beside the never-verified set).
        stale_round, stale_names = stalest_witness(repo_root)
        if stale_round > 0:  # 0 = never-verified, already handled above
            budget = len(window) - len(in_window)
            must_hold = stale_names[:budget]
            left_out = [n for n in must_hold if n not in window]
            if left_out:
                return [
                    f"DRIVER_WINDOW (cut for r{window_round}) leaves the "
                    f"stalest-witness tail (r{stale_round:02d}) undrained: "
                    f"{left_out}"
                ]
        return []

    # Boundary: this window's own results just landed. Full green only.
    data = json.load(open(rounds[newest]))
    not_green = [
        n
        for n in window
        if not (
            isinstance(data.get(n), dict)
            and not data[n].get("err")
            and data[n].get("rows_match") is True
            and data[n].get("schema_match") is True
            and data[n].get("hash_match") is True
        )
    ]
    if not_green:
        return [
            f"window round {window_round} results landed but these window "
            f"queries aren't FULLY green (rows+schema+hash) in "
            f"CORRECTNESS_r{newest:02d}.json: {not_green}"
        ]
    return []


if __name__ == "__main__":
    ob, ro = never_driver_verified()
    print(f"# never driver-verified: {len(ob)} oracle-backed, {len(ro)} rows-only")
    print("# oracle-backed (rotate these into DRIVER_WINDOW first):")
    for n in ob:
        print(f"  {n}")
    print("# rows-only (weaker driver check by design):")
    for n in ro:
        print(f"  {n}")
