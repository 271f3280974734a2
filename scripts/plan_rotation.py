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


class RotationOverflow(ValueError):
    """The staleness contract cannot be met this round: the mandatory
    set (tier-2 changed keys + every staleness≥2 / never-covered key)
    exceeds the window. r13 hit this silently — `sample_stratified`
    was truncated to staleness 3 while the commit message and README
    claimed ≤2 (r13 verdict "What's wrong" #1). The planner now
    HARD-FAILS instead of truncating; passing ``allow_spill=True``
    (CLI: ``--allow-spill``) accepts the spill and returns it in
    ``spilled`` so the round's artifacts can DOCUMENT which keys fell
    past the cap."""


def plan(
    registry: list[str],
    staleness: dict[str, int],
    changed: list[str],
    window: int = WINDOW,
    allow_spill: bool = False,
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
    # Contract enforcement (r13 verdict "What's wrong" #1): every
    # tier-2 key AND every key at staleness ≥ 2 (or never covered)
    # MUST land inside the window, or the "no green row older than two
    # rounds" claim is false for this round. Fail loudly instead of
    # truncating silently.
    mandatory = list(tier2) + [
        k for k in tier1
        if staleness.get(k, -1) >= 2 or staleness.get(k, -1) < 0
    ]
    spilled = [k for k in mandatory if k not in set(order[:window])]
    if spilled and not allow_spill:
        raise RotationOverflow(
            f"{len(mandatory)} mandatory keys (tier2={len(tier2)} + "
            f"staleness>=2/never-covered) overflow the {window}-slot "
            f"window; spilled: {spilled}. Shrink tier 2, grow the "
            "window, or re-run with --allow-spill and DOCUMENT the "
            "spill in the round's artifacts."
        )
    cur_window = set(registry[:window])
    new_window = set(order[:window])
    return {
        "spilled": spilled,
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
    allow_spill = False
    if "--allow-spill" in args:
        allow_spill = True
        args = [a for a in args if a != "--allow-spill"]
    if args and args[0] == "--window":
        window = int(args[1])
        args = args[2:]

    import __spark_entry__ as e

    registry = list(e.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench_full.json")) as f:
        staleness = json.load(f).get("staleness", {})

    p = plan(registry, staleness, args, window, allow_spill=allow_spill)
    print(f"# proposed window ({p['tiers']['t2']} changed + "
          f"{min(p['tiers']['t1'], window - p['tiers']['t2'])} stale + rest), "
          f"{len(registry)} keys total")
    if p["spilled"]:
        print(f"# !! SPILLED past the window (staleness contract "
              f"breached this round — DOCUMENT): {p['spilled']}")
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
