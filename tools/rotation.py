"""Rotation-map helper: turn driver CORRECTNESS files into the next
`registry._VERIFIED_ROUND` update, read-only.

Usage:
    python tools/rotation.py                # use every CORRECTNESS_r*.json
    python tools/rotation.py 7              # ...up to and including r7

Prints three blocks:
  1. the freshest green round per query (the literal dict lines to
     paste into `registry._VERIFIED_ROUND`, grouped by round),
  2. any RED rows in the newest file (these must be fixed, not rotated),
  3. a preview of the next ~50-slot prefix after the update (stalest
     first), so the staging can be sanity-checked before editing.

The tool never writes: updating the registry stays a reviewed edit,
because a wrong rotation silently un-verifies queries (see the
rotation-and-driver-state memory note and STATUS round-7 rules).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 10 ** 9
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m or int(m.group(1)) > limit:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    if not rounds:
        print("no CORRECTNESS_r*.json files found")
        return

    freshest: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                freshest[name] = rnd

    newest = max(rounds)
    reds = [
        (name, row.get("err"))
        for name, row in rounds[newest].items()
        if not (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )
        or row.get("err")
    ]

    red_names = {name for name, _ in reds}

    print(f"# freshest green round per query (from r{min(rounds)}..r{newest})")
    print("# (names RED in the newest file are EXCLUDED from the paste-ready")
    print("#  lines below — an old green must not rotate a currently-failing")
    print("#  query out of the prefix; see the red list.)")
    by_round: dict[int, list[str]] = {}
    for name, rnd in freshest.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        print(f"    # round {rnd} (CORRECTNESS_r{rnd:02d}.json)")
        for name in sorted(by_round[rnd]):
            if name in red_names:
                print(f'    # "{name}": {rnd},  # EXCLUDED: RED in r{newest}')
            else:
                print(f'    "{name}": {rnd},')

    print(f"\n# RED rows in r{newest} (fix before rotating): {len(reds)}")
    for name, err in reds:
        print(f"    {name}: {err}")

    from bc_proj3_spark.registry import _REGISTRY, all_queries

    # Preview the driver-facing prefix with the REAL registry ordering
    # (showcase rank within the stalest round), using the paste-ready
    # map above as if it had been applied: freshest-green round, except
    # red-in-newest names, which are excluded from the paste and so
    # fall back to round 0 — they re-enter the prefix first, matching
    # the paste outcome.
    ordered = list(all_queries())
    effective = {
        n: freshest[n] for n in freshest if n not in red_names
    }
    names = sorted(
        ordered,
        key=lambda n: (effective.get(n, 0), ordered.index(n)),
    )
    print("\n# next 50-slot prefix preview after this update (stalest first;")
    print("# within a staleness tie the registry's live order applies):")
    for i in range(0, 50, 5):
        print("   ", names[i : i + 5])
    never = [n for n in _REGISTRY if n not in freshest]
    print(f"\n# never driver-verified: {len(never)} of {len(_REGISTRY)}")


if __name__ == "__main__":
    main()
