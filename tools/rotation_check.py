"""Driver-window rotation policy check.

The driver's correctness gate hashes only the FIRST 50 ``queries()``
entries at sf0.01; the rest are pinned by the sf0.001 pytest parity
sweep.  The standing policy (README "Driver-window rotation") is that
no oracled query sits outside the 50-entry window forever: each round
rotates queries from the never-gated backlog in, displacing
shape-duplicates whose signal another in-window row carries.

This check makes the policy self-enforcing.  It reads the committed
``CORRECTNESS_r*.json`` files (their key order IS the window the driver
hashed that round) and fails unless, while a backlog of never-gated
queries exists, the CURRENT window (the live ``queries()`` first 50)
rotates in at least ``--min-fresh`` (default 5) entries that were not
in the last recorded round's window — and every fresh slot is spent on
the backlog first.  When the backlog is empty the check passes
regardless of churn (steady-state: every query has been gated at least
once; round-robin re-gating is encouraged but not forced).

Usage:  python tools/rotation_check.py [--min-fresh N]
Exits 0 when the policy holds; 1 with the required rotations otherwise.
"""
from __future__ import annotations

import argparse
import glob
import json
import re
import sys

sys.path.insert(0, ".")

WINDOW = 50


def window_history(repo: str = ".") -> dict[int, list[str]]:
    """round number -> the window (first 50 keys) the driver gated."""
    out: dict[int, list[str]] = {}
    for f in glob.glob(f"{repo}/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        with open(f, encoding="utf-8") as fh:
            data = json.load(fh)
        out[int(m.group(1))] = list(data)[:WINDOW]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-fresh", type=int, default=5,
                    help="minimum never-gated queries the current "
                         "window must rotate in while a backlog exists")
    ap.add_argument("--repo", default=".")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    hist = window_history(args.repo)
    registered = list(entrymod.queries())
    current_window = registered[:WINDOW]
    if not hist:
        print("rotation-check: no CORRECTNESS_r*.json found — nothing "
              "to enforce yet")
        return 0
    rounds = sorted(hist)
    # The window to compare against is the last recorded round the live
    # window actually ROTATED AGAINST.  Once the driver records this
    # round's CORRECTNESS file, the live window equals the latest
    # recorded one — comparing against itself would read fresh==0 and
    # fail forever (the r9 round-clock bug).  In that post-gate state,
    # compare the latest recorded window against the round BEFORE it.
    baseline_round = rounds[-1]
    if current_window == hist[rounds[-1]] and len(rounds) >= 2:
        baseline_round = rounds[-2]
    elif current_window == hist[rounds[-1]]:
        # Only one recorded round and it IS the live window: that round
        # was itself the first gate — nothing earlier to rotate against.
        print("rotation-check: live window equals the only recorded "
              "round (first gate) — nothing to enforce yet")
        return 0
    prev_window = set(hist[baseline_round])
    # "Never gated" must be judged as of the baseline round: entries the
    # live window rotated in are recorded by the gate that follows, and
    # counting that recording against their freshness would zero the
    # check the moment the driver writes the round's CORRECTNESS file.
    ever_gated_at_baseline: set[str] = set()
    for r in rounds:
        if r <= baseline_round:
            ever_gated_at_baseline.update(hist[r])
    ever_gated: set[str] = set(ever_gated_at_baseline)
    for r in rounds:
        ever_gated.update(hist[r])

    backlog = [n for n in registered
               if n not in ever_gated and n not in current_window]
    fresh = [n for n in current_window if n not in prev_window]
    fresh_from_backlog = [n for n in fresh
                          if n not in ever_gated_at_baseline]

    print(f"rotation-check: {len(registered)} registered, "
          f"window {len(current_window)}, fresh-this-round "
          f"{len(fresh)} (never-gated among them "
          f"{len(fresh_from_backlog)}), remaining never-gated backlog "
          f"{len(backlog)}")
    if backlog:
        print("  backlog (rotate these next): "
              + ", ".join(sorted(backlog)[:12])
              + (" ..." if len(backlog) > 12 else ""))

    need = min(args.min_fresh, len(backlog) + len(fresh_from_backlog))
    if len(fresh_from_backlog) < need:
        print(f"rotation-check FAILED: a never-gated backlog of "
              f"{len(backlog)} exists but only "
              f"{len(fresh_from_backlog)} backlog quer"
              f"{'y' if len(fresh_from_backlog) == 1 else 'ies'} "
              f"rotated into the window this round (need {need}).  "
              f"Swap backlog entries in for in-window shape-duplicates "
              f"(README 'Driver-window rotation').")
        return 1
    if not backlog:
        # STEADY STATE (every registered query has been gated at least
        # once): round-robin re-gating is the standing encouragement —
        # surface the most-stale candidates so each round's swap is a
        # copy-paste, not an archaeology dig.  last-gated = the newest
        # recorded round that hashed the query; never-in-hist entries
        # (gated only by the pytest sweep so far this round) sort
        # freshest.
        last_gated = {
            n: max((r for r in rounds if n in hist[r]), default=None)
            for n in registered
        }
        stale = sorted(
            (n for n in registered if n not in current_window),
            key=lambda n: (last_gated[n] is None,
                           last_gated[n] if last_gated[n] is not None
                           else 0, n))
        oldest = [f"{n} (r{last_gated[n]})" for n in stale[:8]
                  if last_gated[n] is not None]
        if oldest:
            print("  steady state: backlog empty — next round's "
                  "round-robin candidates (stalest first): "
                  + ", ".join(oldest))
    print("rotation-check OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
