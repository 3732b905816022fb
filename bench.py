"""Benchmark harness — runs the headline inventory queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): one shared session, Arrow on, AQE on; per query
one untimed warm-up then median of 5 timed runs (raised from 3 in round
3 — the round-2 run showed ±30% single-query wobble on q14/q18 with no
code change on those paths); ``value`` = sum of per-query medians.

Round pooling (round 14, VERDICT r13 item 7): the committed BENCH_rN is
whichever invocation the driver captures, and round 13 showed the
invocations of one round spanning ±45% on single queries with no code
change — the committed file was simply the slowest of six, so round-
over-round deltas encoded run-selection noise. ``queries``/``value``
now report the per-query median over ALL of this round's raw timed runs
at the same (round, mode, sf) — pooled from tools/bench_history.jsonl
plus the current invocation — so re-running bench.py converges the
committed number instead of re-rolling it. ``queries_this_run`` keeps
the unpooled view; ``pooled_invocations`` counts the contributors.

Round 19 (VERDICT r18 items 2/7): ``value_this_run`` reports the
unpooled total top-level so the single-invocation number is always in
the committed record; ``SPARK_GRAFT_NO_POOL=1`` disables pooling
entirely (a driver measurement then cannot blend with builder-run
history); ``default_parallelism`` and ``master`` expose the session's
actual core count so the $SPARK_GRAFT_CPUS contract is self-evident.

``python bench.py --all`` benches EVERY ``queries()`` entry (median of
3 — ~100 queries would make 5 runs a >10-minute pass) so the tail
operators (q44-q80) get per-round numbers, not just the one-off
BASELINE.md anchors. Both modes append their record to
``tools/bench_history.jsonl``; ``python tools/bench_diff.py --gate``
then flags any query that drifted >1.5x above its best recorded anchor
at the same scale factor.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "bench_history.jsonl"
)

HEADLINE = [
    "q01_pricing_summary",
    "q04_group_single_key",
    "q13_join_broadcast",
    "q14_join_multiway",
    "q18_window_topk_per_group",
    "q22_count_distinct",
    "q23_events_tumbling_window",
    "q25_text_stats",
    "q27_dedup_exact",
    "q29_minhash_lsh_dedup",
    "q31_cosine_topk",
    "q33_asof_join",
    "q39_embedding_neardup_pairs",
    "q43_token_explode",
]


def _current_round() -> str | None:
    """Round label for history provenance: ``$SPARK_GRAFT_ROUND`` if set,
    else inferred as (max committed BENCH_r{N}.json at the repo root) + 1
    — during round N the driver has recorded artifacts up to N-1."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return env
    root = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    return f"r{max(rounds) + 1}" if rounds else None


def _code_fingerprint(cwd: str | None = None) -> str | None:
    """Identity of the code being benched: short commit hash, and for a
    dirty tree a content-hash suffix over the uncommitted tracked-file
    diff (round-19 ADVICE fix: ``--dirty`` stamped every uncommitted
    state at the same HEAD identically, so mid-round edits — the exact
    scenario fingerprint pooling exists for — still pooled pre- and
    post-change runs; hashing the diff gives each distinct uncommitted
    state a distinct stamp). None when git/repo is unavailable."""
    import hashlib
    import subprocess

    if cwd is None:
        cwd = os.path.dirname(os.path.abspath(__file__))

    def _git(*args):
        out = subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True, timeout=10
        )
        return out.stdout if out.returncode == 0 else None

    try:
        head = _git("rev-parse", "--short", "HEAD")
        if head is None:
            return None
        head = head.decode().strip()
        diff = _git("diff", "HEAD")
        if diff:  # uncommitted tracked changes -> content-addressed stamp
            return f"{head}-dirty.{hashlib.sha256(diff).hexdigest()[:8]}"
        return head
    except Exception:
        return None


def _pooled_medians(
    round_label: str | None,
    mode: str,
    sf_val,
    raw_runs: dict,
    allowed: set,
    code: str | None,
    cpus: int | None = None,
) -> tuple[dict, int]:
    """Per-query median over every raw timed run this round has
    recorded at the same (round, mode, sf) — the current invocation's
    runs plus earlier ones from bench_history.jsonl. Entries without
    ``runs`` (pre-round-14 history) are skipped, and history is
    restricted to ``allowed`` (the queries this invocation targets):
    a query renamed or removed mid-round must not re-enter the
    committed record through stale history (round-14 review
    finding).

    Round-18 measurement-bug fix: pooling additionally requires the
    record's ``code`` fingerprint to MATCH the current one. An
    optimization round changes query code mid-round, and the old rule
    (same round+mode+sf) blended pre- and post-change runs into one
    median — the committed number then described neither codebase.
    History records predating the field (no ``code`` key) never pool
    with fingerprinted invocations; their raw numbers stay in history
    untouched.

    Same-round addendum: pooling also requires a matching ``cpus``
    stamp — the driver benches the same code at MULTIPLE core counts to
    measure scaling, and a median blending local[32] and local[8] runs
    of the same commit describes neither machine size. Records without
    the stamp (pre-fix history) never pool with stamped invocations.
    Returns (medians, number of contributing invocations)."""
    pools: dict[str, list[float]] = {q: list(r) for q, r in raw_runs.items()}
    invocations = 1
    try:
        with open(HISTORY_PATH) as f:
            lines = f.readlines()
    except OSError:
        lines = []
    for line in lines:
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if (
            rec.get("round") == round_label
            and rec.get("mode") == mode
            and rec.get("sf") == sf_val
            and rec.get("code") == code
            and rec.get("cpus") == cpus
            and isinstance(rec.get("runs"), dict)
        ):
            invocations += 1
            for q, runs in rec["runs"].items():
                if q in allowed:
                    pools.setdefault(q, []).extend(runs)
    return (
        {q: round(statistics.median(r), 3) for q, r in pools.items() if r},
        invocations,
    )


def _append_history(record: dict) -> None:
    """Append one bench record to tools/bench_history.jsonl (best-effort:
    a read-only checkout must not fail the bench)."""
    try:
        with open(HISTORY_PATH, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass


def _cal_burn(_):
    s = 0
    for i in range(20_000_000):
        s += i * i
    return s


def calibrate_host() -> float:
    """Effective parallel throughput of the host RIGHT NOW: wall of a
    fixed 32-way CPU-bound loop (~2 s on an uncontended host). Round
    15 measured the bench host swinging 2.0->3.1 s on this loop across
    minutes-scale windows, with queries landing in slow windows
    reading as 2-10x 'regressions' (BASELINE.md round-15 adjudication)
    — so every bench record carries a start and end calibration, and
    the drift gate scales its threshold by the measured host factor
    instead of flagging window artifacts."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(32) as pool:
        pool.map(_cal_burn, range(32))
    return round(time.perf_counter() - t0, 2)


def spark_probe(spark) -> float:
    """Wall of a FIXED tiny Spark job (32-partition range + codegen
    aggregate, no shuffle, no IO) — the second calibration dimension
    the round-17 adjudication showed is needed: the pure-Python CPU
    loop understates bursty contention as the JVM experiences it
    (measured: queries ran 1.8x their anchors inside a bracket whose
    CPU stamps read 1.4x). Recorded per bracket alongside cal stamps;
    instrumentation-first (bench_diff does not consume it yet — a
    probe reference band needs a few rounds of records, exactly how
    the cal stamps themselves were introduced in round 15)."""
    t0 = time.perf_counter()
    spark.range(0, 64_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    bench_all = "--all" in sys.argv[1:]
    cal_start = calibrate_host()

    from vinum_spark.session import get_spark
    from vinum_spark.inventory import QUERIES

    spark = get_spark("vinum_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(QUERIES) if bench_all else HEADLINE
    n_timed = 3 if bench_all else 5

    # JVM-wide warm-up: whichever query runs FIRST absorbs the
    # whole-stage-codegen compiler, parquet vectorized-reader, and
    # noop-sink class loading in its timed runs otherwise — observed
    # on q01 (always first): timed medians of 0.9 s on a fresh JVM
    # vs 0.55 s steady-state, with raw runs still decaying through
    # run 5. Three untimed passes of the first query (plus its own
    # per-query warm-up below) put its timed runs on the same
    # mid-session footing every other query already enjoys.
    for _ in range(3):
        try:
            QUERIES[names[0]].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            break  # the per-query loop will record the error

    # probe reference taken after the JVM warm-up above, plus one
    # untimed pass of the probe itself — its own range+sum codegen is
    # not covered by the query warm-up (first measured stamp read
    # 0.62 s vs 0.17-0.26 s steady without this)
    spark_probe(spark)
    probe_start = spark_probe(spark)
    probe_mids = []

    timings = {}
    raw_runs = {}
    errors = {}
    cal_mids = []
    for qi, name in enumerate(names):
        if qi and qi % 10 == 0:
            # mid-run calibration: host windows collapse and RECOVER
            # within one --all pass (observed: start/end stamps both
            # fast while mid-run queries sat in a 4-6x window), so the
            # end stamp alone understates the worst window traversed.
            # Every-10-queries sampling (~25 s total overhead on a
            # 15-minute --all pass) catches the sub-minute spikes the
            # first every-25 sampling missed.
            cal_mids.append(calibrate_host())
            probe_mids.append(spark_probe(spark))
        fn = QUERIES[name].fn
        try:
            # warm-up (codegen, file listing, broadcast build)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(n_timed):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # one broken query must not lose the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(statistics.median(runs), 3)
        raw_runs[name] = [round(r, 3) for r in runs]
        if bench_all:
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    probe_end = spark_probe(spark)
    cal_end = calibrate_host()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    mode = "all" if bench_all else "headline"
    round_label = _current_round()
    code = _code_fingerprint()
    # effective core count: the env contract when set, else the
    # master's parallelism (local[*] / spark-submit) — part of the
    # pooling key, since the driver benches at several core counts
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else spark.sparkContext.defaultParallelism
    # SPARK_GRAFT_NO_POOL=1 disables history pooling entirely (round-19,
    # VERDICT r18 item 7): pooling reads builder-committed history, so a
    # driver measurement could blend with builder-run timings whenever it
    # benches an unmodified tree. The env makes the committed value a
    # single-invocation number by construction; ``value_this_run`` below
    # reports the unpooled total unconditionally either way.
    if os.environ.get("SPARK_GRAFT_NO_POOL"):
        pooled, invocations = dict(timings), 1
    else:
        pooled, invocations = _pooled_medians(
            round_label, mode, sf_val, raw_runs, allowed=set(names), code=code,
            cpus=cpus,
        )
    total = round(sum(pooled.values()), 3)
    print(
        json.dumps(
            {
                "metric": (
                    "all_inventory_total_wall"
                    if bench_all
                    else "headline_inventory_total_wall"
                ),
                "value": total,
                "unit": "sec",
                "queries": pooled,
                "value_this_run": round(sum(timings.values()), 3),
                "queries_this_run": timings,
                "runs": raw_runs,
                "pooled_invocations": invocations,
                "sf": sf_val,
                "cpus": cpus,
                # scaling-contract evidence (round-19, VERDICT r18 item
                # 2): the session's ACTUAL parallelism and master, so a
                # reader can verify $SPARK_GRAFT_CPUS reached the JVM
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "cal_start_s": cal_start,
                "cal_end_s": cal_end,
                **({"cal_mids_s": cal_mids} if cal_mids else {}),
                "probe_start_s": probe_start,
                "probe_end_s": probe_end,
                **({"probe_mids_s": probe_mids} if probe_mids else {}),
                **({"errors": errors} if errors else {}),
            }
        )
    )
    _append_history(
        {
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "round": round_label,
            "code": code,
            "mode": mode,
            "sf": sf_val,
            "cpus": cpus,
            "total": round(sum(timings.values()), 3),
            "queries": timings,
            "runs": raw_runs,
            "cal_start_s": cal_start,
            "cal_end_s": cal_end,
            **({"cal_mids_s": cal_mids} if cal_mids else {}),
            "probe_start_s": probe_start,
            "probe_end_s": probe_end,
            **({"probe_mids_s": probe_mids} if probe_mids else {}),
            **({"errors": errors} if errors else {}),
        }
    )


if __name__ == "__main__":
    main()
