"""Cross-round bench regression report + history gate.

Report mode — reads every BENCH_r*.json at the repo root (driver-recorded,
one per round) plus an optional fresh `python bench.py` line piped on
stdin, and prints a per-query table of medians across rounds with the
latest-vs-previous delta:

    python tools/bench_diff.py
    python bench.py | python tools/bench_diff.py

Gate mode — reads ``tools/bench_history.jsonl`` (bench.py appends a
record per run; seeded with the round-7 anchors incl. the q54-q78 tail
from BASELINE.md), compares the LATEST record's per-query medians
against the median of the BEST ``ANCHOR_BEST_N`` same-sf records for
that query, and exits nonzero when a query drifted more than
``--threshold`` (1.5x) above that anchor AND by more than ``--floor``
(0.25 s) absolute — the
floor keeps 0.2 s queries, where scheduler jitter alone is 50%, from
tripping the gate. Run it each round after ``python bench.py --all``:

    python bench.py --all && python tools/bench_diff.py --gate

Why median, not min: the round-8 gate anchored on the best value ever
recorded, which is a one-way ratchet — a single lucky round (lightly
loaded host, favourable JIT state) permanently tightens the bar for
every later round. That is exactly what happened to
q23_events_tumbling_window: rounds 1-6 recorded 0.36-0.44 s, round 7
a one-off 0.288 s, and round 8's noise-elevated 0.566 s then read as
a 1.97x "regression" (reproduced at 0.285 s in round 9 — see
BASELINE.md "q23 adjudication"). The median of history is robust to
outliers on both sides; drift output still names the best record so
the provenance of the fastest run is visible.

Why median of the best N, not of ALL history (round-10 refinement): a
plain median-of-history lets a SUSTAINED regression self-normalize —
each regressed round appends a regressed record, and once those
outnumber the healthy ones the median has crept up to the regression
and the drift goes invisible. Anchoring on the median of the best
``ANCHOR_BEST_N`` records keeps the bar where the engine has proven it
can be (regressed records never enter the best-N set) while still
absorbing a single lucky outlier (it is a median of N, not a min).
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.jsonl")

#: Anchor = median of the best N same-sf records per query. N=5 rides
#: out one lucky round (median, not min) without letting a sustained
#: regression drag the anchor toward itself (slow records never make
#: the best-5).
ANCHOR_BEST_N = 5

#: ceiling on host-window threshold scaling: beyond ~1.75x the window
#: is too contended to adjudicate and the gate reports INCONCLUSIVE
#: (exit 3) instead of loosening itself into meaninglessness (the
#: round-15 microVM's worst measured factor was 2.26/2.03 ~ 1.11 run-
#: over-ref with per-window swings to ~1.5x; 1.75 covers real windows
#: with margin while a 3x-contended host still refuses to pass)
HOST_FACTOR_CAP = 1.75

#: the Spark micro-probe's own wall on a QUIET window is 0.08-0.4 s
#: (scheduler jitter dominates a ~0.1 s 32-task job — measured across
#: the seven r17 probe-stamped records), so a stamp below this floor is
#: treated as clean (factor 1). The probe dimension only speaks when
#: the JVM measurably stalled — it can LOOSEN a block's threshold or
#: mark it inconclusive, never tighten the gate, and never manufactures
#: a factor out of its own jitter band.
PROBE_FLOOR = 0.5


def gate(threshold: float = 1.5, floor: float = 0.25,
         history_path: str = HISTORY_PATH) -> int:
    """Return a process exit code: 0 clean, 1 drift found, 2 unusable
    history, 3 inconclusive (host window past HOST_FACTOR_CAP — rerun
    on a quieter host rather than trusting a loosened threshold)."""
    try:
        with open(history_path) as f:
            records = [json.loads(l) for l in f if l.strip()]
    except OSError:
        print(f"gate: no history at {history_path}; run bench.py first")
        return 2
    if len(records) < 2:
        print("gate: need >=2 history records (anchors + a fresh run)")
        return 2
    latest = records[-1]
    sf = latest.get("sf")
    # Host-window normalization (round 15): bench.py stamps a 32-way
    # CPU calibration at run start and end (cal_start_s/cal_end_s; see
    # BASELINE.md round-15 adjudication — the host's effective
    # parallel throughput swings 1.0-1.5x across minutes-scale
    # windows, and a full --all run in a slow window reads as dozens
    # of 2-10x "regressions" with no common code path). The anchor
    # values were set on fast-window hosts, so the gate scales its
    # threshold by the measured host factor: cal_run (the WORSE of
    # the run's two calibrations — a window that collapses mid-run
    # slows the later queries) over cal_ref (the best calibration any
    # history record has seen). Records without calibration stamps
    # (pre-round-15) scale by 1 — the historical behavior.
    cal_run = max(
        [
            float(latest.get("cal_start_s") or 0),
            float(latest.get("cal_end_s") or 0),
        ]
        + [float(c) for c in latest.get("cal_mids_s", [])]
    )
    # 2.03 s = the best calibration measured in round 15 (BASELINE.md),
    # the proxy for the fast-window hosts the pre-calibration anchors
    # were set on; a future faster host's own records take over via min
    cal_refs = [2.03] + [
        min(float(r["cal_start_s"]), float(r["cal_end_s"]))
        for r in records
        if r.get("cal_start_s") and r.get("cal_end_s")
    ]
    cal_ref = min(cal_refs)
    # Per-BLOCK host factors (round 17): bench.py samples a mid-run
    # calibration every 10 queries, so the stamps BRACKET each 10-query
    # block — [start, mid0] covers queries 0-9, [mid0, mid1] covers
    # 10-19, ..., [mid_last, end] the tail. A single transient spike
    # (observed: one 6.89 s mid inside a run whose other eleven stamps
    # read 2.28-3.35 s) therefore only degrades the queries timed in
    # ITS bracket; scaling the whole run by the worst stamp — the
    # round-16 behavior — let one 25-second collapse veto a 20-minute
    # record. Each query's threshold now scales by the worse of its
    # block's two bracketing stamps; a block past HOST_FACTOR_CAP is
    # individually INCONCLUSIVE (its queries are not adjudicated this
    # run, their anchors stand) while the rest of the record still
    # adjudicates. The whole run degrades to the old worst-stamp
    # behavior when per-block attribution is impossible: no mids
    # (headline runs), or errored queries (their skipped slots shift
    # every later query's bracket).
    mids = [float(c) for c in latest.get("cal_mids_s", [])]
    q_order = list(latest.get("queries", {}))
    blockable = (
        mids
        and not latest.get("errors")
        and latest.get("cal_start_s")
        and latest.get("cal_end_s")
        # a record pooled from >1 invocation holds medians whose runs
        # span SEVERAL calibration windows — the latest invocation's
        # brackets cannot be attributed to them (round-18 advice);
        # degrade to whole-run scaling by the worst stamp
        and int(latest.get("pooled_invocations") or 1) <= 1
    )
    whole_run_factor = max(1.0, cal_run / cal_ref) if cal_run else 1.0

    def query_factor(q: str) -> float:
        if not blockable:
            return whole_run_factor
        stamps = (
            [float(latest["cal_start_s"])] + mids + [float(latest["cal_end_s"])]
        )
        b = q_order.index(q) // 10
        lo = stamps[min(b, len(stamps) - 1)]
        hi = stamps[min(b + 1, len(stamps) - 1)]
        return max(1.0, max(lo, hi) / cal_ref)

    # Spark micro-probe as a SECOND host dimension (round 18; bench.py
    # has stamped probe_start/mids/end since r17): the CPU loop
    # understates bursty JVM contention (measured r17: queries at 1.8x
    # anchor inside a bracket whose CPU stamps read 1.4x, one 6.9 s
    # probe transient on an otherwise-clean run). Reference = median of
    # each probe-stamped record's BEST stamp (median, not min: the
    # probe is a ~0.1 s job whose own scheduler jitter spans 0.08-0.4 s
    # — a min reference would turn quiet-window jitter into phantom
    # 3x factors). A stamp below PROBE_FLOOR is clean regardless.
    # reference from PRIOR records only — a uniformly degraded latest
    # run must not supply its own reference and self-normalize
    probe_recs = [
        r
        for r in records[:-1]
        if r.get("probe_start_s") and r.get("probe_end_s")
    ]
    probe_ref = (
        statistics.median(
            min(
                [float(r["probe_start_s"]), float(r["probe_end_s"])]
                + [float(p) for p in r.get("probe_mids_s", [])]
            )
            for r in probe_recs
        )
        if probe_recs
        else None
    )
    p_mids = [float(p) for p in latest.get("probe_mids_s", [])]
    have_probe = bool(
        probe_ref and latest.get("probe_start_s") and latest.get("probe_end_s")
    )
    probe_stamps = (
        [float(latest["probe_start_s"])]
        + p_mids
        + [float(latest["probe_end_s"])]
        if have_probe
        else []
    )
    # per-block probe attribution needs the probe mids to pair 1:1 with
    # the cal mids (bench.py stamps them together every 10 queries)
    probe_blockable = have_probe and blockable and len(p_mids) == len(mids)

    def _probe_f(stamps) -> float:
        worst = max(stamps)
        if worst < PROBE_FLOOR:
            return 1.0
        # divide by max(reference, floor), not the raw reference: with
        # a quiet-band reference (~0.15 s) a raw ratio would jump
        # discontinuously from 1.0 at 0.49 s to ~3.4x (past the cap)
        # at 0.51 s — the graduated loosen-then-inconclusive behavior
        # the comment above promises would be unreachable. Anchored at
        # the floor, a 0.6 s stamp loosens thresholds x1.2 and only a
        # genuine multi-second stall (e.g. the measured 6.9 s -> x13.8)
        # crosses HOST_FACTOR_CAP into INCONCLUSIVE.
        return max(1.0, worst / max(probe_ref, PROBE_FLOOR))

    whole_probe_factor = _probe_f(probe_stamps) if have_probe else 1.0

    def probe_factor(q: str) -> float:
        if not have_probe:
            return 1.0
        if not probe_blockable:
            return whole_probe_factor
        b = q_order.index(q) // 10
        lo = probe_stamps[min(b, len(probe_stamps) - 1)]
        hi = probe_stamps[min(b + 1, len(probe_stamps) - 1)]
        return _probe_f([lo, hi])

    host_factor = whole_run_factor
    if (
        have_probe
        and not probe_blockable
        and whole_probe_factor > HOST_FACTOR_CAP
    ):
        print(
            f"gate: INCONCLUSIVE — Spark probe stamped "
            f"{max(probe_stamps):.2f}s vs reference {probe_ref:.2f}s "
            f"(x{whole_probe_factor:.2f} > cap {HOST_FACTOR_CAP}) and "
            "per-block attribution is unavailable; the JVM saw "
            "contention the CPU loop missed. Rerun bench.py on a "
            "quieter host window."
        )
        return 3
    if cal_run and not blockable and host_factor > HOST_FACTOR_CAP:
        print(
            f"gate: INCONCLUSIVE — host calibration {cal_run:.2f}s is "
            f"x{host_factor:.2f} the best recorded "
            f"{cal_ref:.2f}s (cap {HOST_FACTOR_CAP}); this window "
            "is too contended to distinguish drift from host noise. "
            "Rerun bench.py on a quieter host window."
        )
        return 3
    if cal_run and host_factor > 1.02:
        print(
            f"gate: host calibration {cal_run:.2f}s vs best recorded "
            f"{cal_ref:.2f}s -> worst-stamp factor x{host_factor:.2f}"
            + (
                " (per-block scaling active — each query scales by its "
                "own bracket's stamps)"
                if blockable
                else " (whole-run scaling: per-block attribution "
                "unavailable)"
            )
        )
    if have_probe and max(probe_stamps) >= PROBE_FLOOR:
        print(
            f"gate: Spark probe worst stamp {max(probe_stamps):.2f}s vs "
            f"reference {probe_ref:.2f}s -> probe factor "
            f"x{whole_probe_factor:.2f}"
            + (
                " (per-block)"
                if probe_blockable
                else " (whole-run)"
            )
        )
    # per-query history: list of (value, provenance) over all prior
    # same-sf records; provenance is the record's round field when
    # bench.py stamped one, else its mode/ts
    hist: dict[str, list[tuple[float, str]]] = {}
    for rec in records[:-1]:
        if rec.get("sf") != sf:
            continue
        src = str(rec.get("round") or rec.get("mode") or rec.get("ts", "?"))
        for q, v in rec.get("queries", {}).items():
            if isinstance(v, (int, float)):
                hist.setdefault(q, []).append((float(v), src))
    drifted = []
    fresh = []
    inconclusive = []
    for q, v in latest.get("queries", {}).items():
        if q not in hist:
            fresh.append(q)
            continue
        # each query's threshold scales by the WORSE of the two host
        # dimensions in its bracket: CPU-loop calibration and the
        # Spark micro-probe (the probe catches JVM-side stalls the
        # Python loop sleeps through); a bracket past the cap in
        # either dimension is inconclusive, not adjudicated
        f_q = max(query_factor(q), probe_factor(q))
        if f_q > HOST_FACTOR_CAP:
            inconclusive.append((q, f_q))
            continue
        anchor = statistics.median(
            sorted(x for x, _ in hist[q])[:ANCHOR_BEST_N]
        )
        if v > anchor * threshold * f_q and v - anchor > floor:
            best_v, best_src = min(hist[q])
            drifted.append((q, anchor, len(hist[q]), best_v, best_src, v,
                            v / anchor, threshold * f_q))
    for q in fresh:
        print(f"gate: {q}: first record at sf={sf} "
              f"({latest['queries'][q]:.3f}s) — now anchored")
    n_q = len(latest.get("queries", {}))
    if inconclusive:
        qs = ", ".join(q for q, _ in inconclusive)
        print(
            f"gate: {len(inconclusive)} quer"
            f"{'y' if len(inconclusive) == 1 else 'ies'} INCONCLUSIVE "
            f"(their calibration bracket exceeded x{HOST_FACTOR_CAP}; "
            f"anchors stand, re-adjudicated next run): {qs}"
        )
        if len(inconclusive) > n_q // 2:
            print(
                "gate: INCONCLUSIVE — more than half the record sat in "
                "contended brackets; rerun bench.py on a quieter window."
            )
            return 3
    if drifted:
        for q, a, n_rec, bv, bsrc, v, r, eff in sorted(
            drifted, key=lambda t: -t[6]
        ):
            print(f"gate: DRIFT {q}: {v:.3f}s vs median anchor {a:.3f}s "
                  f"over {n_rec} record{'s' if n_rec != 1 else ''} "
                  f"({r:.2f}x > {eff:.2f}x; best {bv:.3f}s set by {bsrc})")
        print(f"gate: {len(drifted)} quer{'y' if len(drifted)==1 else 'ies'} "
              f"regressed beyond {threshold}x (host-scaled per block, "
              f"+{floor}s floor)")
        return 1
    n = n_q - len(fresh) - len(inconclusive)
    print(f"gate: clean — {n} queries within {threshold}x (host-scaled "
          f"per block) of median-of-best-{ANCHOR_BEST_N} anchors at sf={sf}")
    return 0


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
    if "--gate" in sys.argv[1:]:
        def _flag(name: str, default: float) -> float:
            for i, a in enumerate(sys.argv):
                if a == name and i + 1 < len(sys.argv):
                    return float(sys.argv[i + 1])
            return default

        sys.exit(gate(_flag("--threshold", 1.5), _flag("--floor", 0.25)))
    main()
