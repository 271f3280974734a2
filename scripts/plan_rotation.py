"""Rotation planner for the driver's 50-slot correctness window.

The correctness harness checks exactly the first 50 ``queries()``
entries, so registration order is coverage policy (the standing
stale-first rotation adopted r6 — see ``__spark_entry__._PRIORITY``).
Maintaining that list by hand is an off-by-one magnet as the registry
grows (139 keys and counting); this script computes the proposed
window mechanically:

  tier 2 — keys NEW or CHANGED this round (passed on the command
           line): their old evidence no longer covers the code, they
           jump the queue;
  tier 1 — keys whose latest green driver row is OLDEST
           (``bench_full.json`` staleness, descending; -1 = never
           covered sorts first);
  tier 3 — everything else in current registry order (freshest
           evidence, safe to ride past the cap).

Prints the ordered key list with the 50-slot boundary marked, which
keys fall out of the window relative to the CURRENT registry order,
and a ready-to-paste Python list literal. It never edits
``__spark_entry__.py`` — the human (and the committed diff) stay in
the loop.

Usage:
    python scripts/plan_rotation.py [--window N] [changed_key ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def plan(
    registry: list[str],
    staleness: dict[str, int],
    changed: list[str],
    window: int = WINDOW,
) -> dict:
    """Pure planning core (unit-tested): returns the proposed order,
    the window slice, and the diff vs the current window."""
    unknown = [k for k in changed if k not in registry]
    if unknown:
        raise ValueError(f"changed keys not in registry: {unknown}")
    tier2 = list(dict.fromkeys(changed))
    rest = [k for k in registry if k not in tier2]
    # -1 (never covered) is the most urgent; then larger staleness
    tier1 = sorted(
        (k for k in rest if staleness.get(k, -1) != 0),
        key=lambda k: (-(staleness.get(k, -1) if staleness.get(k, -1) >= 0
                         else 10**6), registry.index(k)),
    )
    tier3 = [k for k in rest if k not in set(tier1)]
    order = tier2 + tier1 + tier3
    cur_window = set(registry[:window])
    new_window = set(order[:window])
    return {
        "order": order,
        "window": order[:window],
        "enter": sorted(new_window - cur_window),
        "exit": sorted(cur_window - new_window),
        "tiers": {"t2": len(tier2), "t1": len(tier1), "t3": len(tier3)},
        # never-covered (-1) keys outside the window are the MOST urgent,
        # not the least — map them to the same 10**6 sentinel the tier-1
        # sort uses so the "compensate if > 1" hint can't miss them.
        "max_stale_outside": max(
            ((staleness[k] if staleness.get(k, -1) >= 0 else 10**6)
             for k in order[window:]),
            default=0,
        ),
        "never_covered_outside": sorted(
            k for k in order[window:] if staleness.get(k, -1) < 0
        ),
    }


def main() -> int:
    args = sys.argv[1:]
    window = WINDOW
    if args and args[0] == "--window":
        window = int(args[1])
        args = args[2:]

    import __spark_entry__ as e

    registry = list(e.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench_full.json")) as f:
        staleness = json.load(f).get("staleness", {})

    p = plan(registry, staleness, args, window)
    print(f"# proposed window ({p['tiers']['t2']} changed + "
          f"{min(p['tiers']['t1'], window - p['tiers']['t2'])} stale + rest), "
          f"{len(registry)} keys total")
    print(f"# enters window: {p['enter']}")
    print(f"# leaves window: {p['exit']}")
    print(f"# max staleness left outside: {p['max_stale_outside']} "
          "(compensate with the full mirror sweep if > 1)")
    if p["never_covered_outside"]:
        print(f"# NEVER-covered keys outside window: "
              f"{p['never_covered_outside']}")
    print("_PRIORITY = [")
    for i, k in enumerate(p["order"]):
        if i == window:
            print("    # ---- window boundary "
                  + "-" * 40 + "\n    # (everything below rides "
                  "prior-round evidence + the mirror sweep)")
        print(f'    "{k}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
