"""Cross-round bench regression report.

Reads every BENCH_r*.json at the repo root (driver-recorded, one per
round) plus an optional fresh `python bench.py` line piped on stdin, and
prints a per-query table of medians across rounds with the latest-vs-
previous delta. Intended use each round: run after bench.py to spot real
regressions vs the documented ±30% single-query wobble (BASELINE.md).

    python tools/bench_diff.py
    python bench.py | python tools/bench_diff.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    def round_key(p: str):
        m = re.search(r"r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json")), key=round_key):
        with open(path) as f:
            data = json.load(f)
        # driver records wrap bench stdout in a `tail` field — extract the
        # one JSON line bench.py printed
        if "queries" not in data and "tail" in data:
            for line in reversed(data["tail"].splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        data = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
        if "queries" not in data:
            continue
        rounds.append((os.path.basename(path).split(".")[0], data))
    if not sys.stdin.isatty():
        piped = sys.stdin.read().strip().splitlines()
        for line in reversed(piped):
            try:
                data = json.loads(line)
            except json.JSONDecodeError:
                continue
            # accept only an actual bench record (bench.py prints exactly
            # one; stray JSON-parseable log lines are skipped)
            if isinstance(data, dict) and "queries" in data:
                rounds.append(("current", data))
                break
    if len(rounds) < 2:
        print("need at least two bench records to diff")
        return

    names = []
    for _, data in rounds:
        for q in data.get("queries", {}):
            if q not in names:
                names.append(q)
    labels = [label for label, _ in rounds]
    header = ["query"] + labels + ["last/prev"]
    print("\t".join(header))
    last, prev = rounds[-1][1]["queries"], rounds[-2][1]["queries"]
    for q in names:
        row = [q]
        for _, data in rounds:
            v = data.get("queries", {}).get(q)
            row.append(f"{v:.3f}" if v is not None else "-")
        if q in last and q in prev and prev[q]:
            row.append(f"{last[q] / prev[q]:.2f}x")
        else:
            row.append("-")
        print("\t".join(row))
    totals = [f"{data.get('value', 0):.3f}" for _, data in rounds]
    print("\t".join(["TOTAL"] + totals + ["-"]))


if __name__ == "__main__":
    main()
