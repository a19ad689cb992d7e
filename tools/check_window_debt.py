"""Standing gate: no registered query may dodge the driver window.

The driver officially checks only the first 50 registered queries each
round (CORRECTNESS_r{N}.json). As the registry grows, queries registered
after a round's window snapshot have never earned an official record —
round 10 accumulated 39 such queries. This gate makes that debt loud:

- A query with NO record in any CORRECTNESS_r*.json must be inside the
  CURRENT first-50 window (i.e. queued for the upcoming round). A
  never-checked query parked out-of-window is an ERROR.
- A query first seen ≥ MAX_UNCHECKED_ROUNDS rounds ago that still has no
  record is an ERROR even if it is finally in the window now (it should
  have rotated in earlier) — tracked via tools/window_debt.json, which
  records the round each query name was first observed by this tool.
- Staleness (rounds since last official record) is reported for the
  whole registry so the rotation order in registry/window.py can be
  audited, but stale-with-a-green-row is informational only: check_oracle
  re-verifies the full registry locally every round.

Usage: python tools/check_window_debt.py          # report + exit 1 on debt
       python tools/check_window_debt.py --update # also persist first-seen
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

MAX_UNCHECKED_ROUNDS = 2  # a query may miss at most one window snapshot
STATE = os.path.join(os.path.dirname(__file__), "window_debt.json")


def main() -> int:
    from covid_custom_sql_engine_spark.registry._base import QUERIES

    names = list(QUERIES)
    window = set(names[:50])

    last_checked: dict[str, int] = {}
    rounds = []
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            rec = json.load(f)
        for q in rec:
            last_checked[q] = max(last_checked.get(q, 0), rnd)
    current_round = (max(rounds) + 1) if rounds else 1

    first_seen: dict[str, int] = {}
    if os.path.exists(STATE):
        with open(STATE) as f:
            first_seen = json.load(f)
    for q in names:
        first_seen.setdefault(q, current_round)
    if "--update" in sys.argv:
        with open(STATE, "w") as f:
            json.dump(first_seen, f, indent=1, sort_keys=True)

    errors = []
    never = [q for q in names if q not in last_checked]
    for q in never:
        age = current_round - first_seen[q]
        if q not in window:
            errors.append(
                f"NEVER-CHECKED OUT-OF-WINDOW: {q} (registered r{first_seen[q]}) "
                f"has no official record and is not queued in the first 50"
            )
        elif age >= MAX_UNCHECKED_ROUNDS:
            errors.append(
                f"OVERDUE: {q} first seen r{first_seen[q]}, still unchecked at "
                f"r{current_round} (> {MAX_UNCHECKED_ROUNDS - 1} missed windows)"
            )

    stale = sorted(
        ((current_round - r, q) for q, r in last_checked.items() if q in names),
        reverse=True,
    )
    print(f"registry: {len(names)} queries; upcoming round: r{current_round}")
    print(f"never officially checked: {len(never)} "
          f"({sum(1 for q in never if q in window)} queued in-window)")
    if stale:
        print("stalest official records (rounds-ago, query):")
        for age, q in stale[:10]:
            print(f"  {age:3d}  {q}")
    for e in errors:
        print(f"ERROR: {e}")
    print("OK" if not errors else f"{len(errors)} violations")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
