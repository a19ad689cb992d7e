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
- STALENESS IS BOUNDED (round-12 hardening, per the round-11 verdict's
  advice #1): a query whose most recent official record is
  ≥ MAX_STALE_ROUNDS rounds old must be queued in the current window,
  else ERROR. With a 50-slot window and a ~310-query registry a full
  refresh takes ≥6 rounds, so the ceiling is set just above that floor;
  it forces the rotation in registry/window.py to keep draining the
  oldest records instead of letting them age without bound.
- DOCUMENTED COUNTS MUST MATCH THE REGISTRY (round-11 verdict advice
  #9): README ("registry/  N named queries") and SURVEY.md ("Registry
  total: N oracled queries") each hand-state the registry size; a
  drifted number would ship silently, so any mismatch with
  len(QUERIES) is an ERROR.

Usage: python tools/check_window_debt.py          # report + exit 1 on debt
       python tools/check_window_debt.py --update # also persist first-seen
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

# Derive the repo root from this file's location (round-11 ADVICE.md:
# hardcoding /root/repo made the gate silently report zero rounds from
# any other checkout).
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_UNCHECKED_ROUNDS = 2  # a query may miss at most one window snapshot
MAX_STALE_ROUNDS = 7      # oldest allowed official record, unless queued now
STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "window_debt.json")


def _documented_counts() -> dict[str, list[int]]:
    """Registry sizes hand-stated in README.md and SURVEY.md."""
    found: dict[str, list[int]] = {}
    readme = os.path.join(REPO, "README.md")
    if os.path.exists(readme):
        with open(readme) as f:
            found["README.md"] = [
                int(m.group(1))
                for m in re.finditer(r"registry/\s+(\d+) named queries",
                                     f.read())
            ]
    survey = os.path.join(REPO, "SURVEY.md")
    if os.path.exists(survey):
        with open(survey) as f:
            # only the final (current) "Registry total" statement binds;
            # earlier ones are historical per-round notes
            totals = [
                int(m.group(1))
                for m in re.finditer(r"Registry total: (\d+) oracled queries",
                                     f.read())
            ]
            found["SURVEY.md"] = totals[-1:]
    return found


def main() -> int:
    from covid_custom_sql_engine_spark.registry._base import QUERIES

    names = list(QUERIES)
    window = set(names[:50])

    last_checked: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
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
    for age, q in stale:
        if age >= MAX_STALE_ROUNDS and q not in window:
            errors.append(
                f"STALE OUT-OF-WINDOW: {q} last officially checked "
                f"r{current_round - age} (age {age} ≥ {MAX_STALE_ROUNDS} "
                f"rounds) and is not queued in the first 50"
            )

    for doc, counts in _documented_counts().items():
        if not counts:
            errors.append(f"COUNT MISSING: {doc} no longer states the "
                          f"registry size (pattern drift?)")
        for c in counts:
            if c != len(names):
                errors.append(
                    f"COUNT DRIFT: {doc} states {c} queries; registry "
                    f"has {len(names)}"
                )

    print(f"registry: {len(names)} queries; upcoming round: r{current_round}")
    print(f"never officially checked: {len(never)} "
          f"({sum(1 for q in never if q in window)} queued in-window)")
    if stale:
        max_age = stale[0][0]
        n_at_max = sum(1 for a, _ in stale if a == max_age)
        print(f"max official-record staleness: {max_age} rounds "
              f"({n_at_max} queries; ceiling {MAX_STALE_ROUNDS}, "
              f"in-window exempt)")
        print("stalest official records (rounds-ago, query):")
        for age, q in stale[:10]:
            queued = " [queued]" if q in window else ""
            print(f"  {age:3d}  {q}{queued}")
    for e in errors:
        print(f"ERROR: {e}")
    print("OK" if not errors else f"{len(errors)} violations")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
