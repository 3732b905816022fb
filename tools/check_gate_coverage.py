"""Gate-rotation hygiene check — mechanical staleness detection.

The round driver's correctness gate records only the first 50
``queries()`` entries, and the head is rotated by hand each round
(``vinum_spark/inventory.py:_GATE_HEAD``). Hand rotation has two
failure modes this check catches mechanically:

1. a query registered late in a round and never promoted — it has NO
   driver CORRECTNESS row, ever (the r14 q100-q103 situation);
2. a family parked in the gate tail for many rounds — its last driver
   row ages out silently (the r13 q02-q12 situation).

Rule: every registered query must EITHER sit in the current
``_GATE_HEAD`` (it gets a driver row this round) OR have a driver
CORRECTNESS row within the last ``K`` recorded rounds (default 6 — the
q02-q12 staleness lasted 6 recordless rounds before a judge flagged
it, so 6 is the largest K that would still have caught it on time).
The complementary in-suite requirement — every query outside the head
still runs its exact oracle locally — is enforced by the
``check_oracle.py`` stage of ``verify_round.py``, which runs the FULL
inventory, so this check only audits the driver-record axis.

Usage: python tools/check_gate_coverage.py [--k 6]
Exits nonzero listing every violating query.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def recent_driver_rows(k: int) -> tuple[set, list]:
    """Union of query names recorded in the last ``k`` driver
    CORRECTNESS files (by round number)."""
    rounds = []
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    rounds.sort()
    recent = rounds[-k:]
    names: set = set()
    for _, path in recent:
        with open(path) as f:
            names.update(json.load(f))
    return names, [n for n, _ in recent]


def main() -> None:
    args = sys.argv[1:]
    k = int(args[args.index("--k") + 1]) if "--k" in args else 6
    from vinum_spark.inventory import _GATE_HEAD, QUERIES

    recorded, rounds = recent_driver_rows(k)
    head = set(_GATE_HEAD)
    stale = sorted(
        name for name in QUERIES if name not in head and name not in recorded
    )
    if stale:
        print(
            f"check_gate_coverage: {len(stale)} quer"
            f"{'y has' if len(stale) == 1 else 'ies have'} neither a seat "
            f"in the current _GATE_HEAD nor a driver CORRECTNESS row in "
            f"the last {k} recorded rounds ({rounds}):"
        )
        for name in stale:
            print(f"  {name}")
        print(
            "fix: rotate them into _GATE_HEAD (vinum_spark/inventory.py) "
            "per the documented selection rule, demoting family-redundant "
            "members with in-gate siblings."
        )
        sys.exit(1)
    print(
        f"check_gate_coverage: OK — all {len(QUERIES)} registered queries "
        f"are in the current 50-seat head or driver-recorded within the "
        f"last {k} rounds ({rounds})."
    )


if __name__ == "__main__":
    main()
