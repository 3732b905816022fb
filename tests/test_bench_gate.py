"""Unit tests for the bench drift gate's host-window normalization
(tools/bench_diff.py) — pure-python, no Spark session.

The round-17 refinement under test: bench.py's mid-run calibration
stamps BRACKET each 10-query block, so a transient host spike must
only invalidate ITS block (those queries go INCONCLUSIVE, anchors
stand) while the rest of the record still adjudicates — the round-16
worst-stamp behavior let one 25-second collapse veto a 20-minute
record with a whole-run INCONCLUSIVE.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from bench_diff import gate  # noqa: E402


def _write_history(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _anchors(n_queries, value=1.0, cal=2.0):
    """A few clean same-sf anchor records."""
    qs = {f"q{i:02d}": value for i in range(n_queries)}
    return [
        {"sf": "0.1", "queries": qs, "cal_start_s": cal, "cal_end_s": cal}
        for _ in range(5)
    ]


def test_transient_spike_invalidates_only_its_block(tmp_path):
    """45 queries -> 5 blocks; a spike in mids[1] brackets blocks 1
    AND 2 (queries 10-29), making exactly those INCONCLUSIVE — a
    minority, so the rest of the record still adjudicates, and a real
    regression planted in block 4 is still caught despite the spike
    elsewhere."""
    n = 45
    latest = {
        "sf": "0.1",
        # block 4 (q40..q44) regressed 3x; everything else at anchor
        "queries": {
            f"q{i:02d}": (3.0 if i >= 40 else 1.0) for i in range(n)
        },
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        # mids at queries 10/20/30/40; the 9.0 brackets blocks 1 and 2
        "cal_mids_s": [2.0, 9.0, 2.0, 2.0],
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _anchors(n) + [latest])
    # exit 1: the block-2 regression is adjudicated despite the spike
    assert gate(history_path=hist) == 1

    # same spike, NO regression -> clean exit, not INCONCLUSIVE
    latest2 = dict(latest, queries={f"q{i:02d}": 1.0 for i in range(n)})
    _write_history(hist, _anchors(n) + [latest2])
    assert gate(history_path=hist) == 0


def test_majority_contended_record_is_inconclusive(tmp_path):
    """When most blocks sit past the cap the record adjudicates
    nothing — distinct INCONCLUSIVE exit (3), the r16 semantics."""
    n = 20
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 1.0 for i in range(n)},
        "cal_start_s": 9.0,
        "cal_end_s": 9.0,
        "cal_mids_s": [9.0],
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _anchors(n) + [latest])
    assert gate(history_path=hist) == 3


def test_no_mids_falls_back_to_whole_run_worst_stamp(tmp_path):
    """Headline runs carry no mids: per-block attribution is
    impossible, so the old worst-stamp whole-run behavior applies —
    a bad stamp means whole-run INCONCLUSIVE."""
    n = 10
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 1.0 for i in range(n)},
        "cal_start_s": 2.0,
        "cal_end_s": 9.0,
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _anchors(n) + [latest])
    assert gate(history_path=hist) == 3


def test_errored_run_falls_back_to_whole_run(tmp_path):
    """An errored query shifts every later query's bracket, so
    per-block attribution is disabled: with a spike in the mids the
    whole record is INCONCLUSIVE, never mis-bracketed."""
    n = 25
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 1.0 for i in range(n)},
        "errors": {"qXX": "boom"},
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        "cal_mids_s": [9.0, 2.0],
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _anchors(n) + [latest])
    assert gate(history_path=hist) == 3


def test_scaled_threshold_within_cap_passes_window_noise(tmp_path):
    """A mildly degraded window (factor under the cap) scales the
    threshold instead of flagging: 1.9x values at a x1.4 bracket pass
    the 1.5x threshold (eff 2.1x), and the same values in a clean
    bracket FAIL."""
    n = 10
    vals = {f"q{i:02d}": 1.9 for i in range(n)}
    hist = str(tmp_path / "h.jsonl")
    degraded = {
        "sf": "0.1",
        "queries": vals,
        "cal_start_s": 2.8,
        "cal_end_s": 2.8,
        "cal_mids_s": [2.8],
    }
    _write_history(hist, _anchors(n) + [degraded])
    assert gate(history_path=hist) == 0
    clean_window = dict(degraded, cal_start_s=2.0, cal_end_s=2.0,
                        cal_mids_s=[2.0])
    _write_history(hist, _anchors(n) + [clean_window])
    assert gate(history_path=hist) == 1


def _probe_anchors(n_queries, value=1.0, cal=2.0, probe=0.15):
    """Clean anchors that also carry Spark probe stamps (post-r17)."""
    qs = {f"q{i:02d}": value for i in range(n_queries)}
    return [
        {
            "sf": "0.1",
            "queries": qs,
            "cal_start_s": cal,
            "cal_end_s": cal,
            "probe_start_s": probe,
            "probe_end_s": probe,
        }
        for _ in range(5)
    ]


def test_probe_absorbs_jvm_stall_the_cpu_loop_missed(tmp_path):
    """The round-17 finding under test: a bursty bracket where the
    CPU-loop calibration reads CLEAN (the Python loop slept through
    the contention) but the Spark probe stamped a multi-second stall.
    Without the probe dimension the 3x values in that bracket read as
    DRIFT (false positive); with it, the bracket is INCONCLUSIVE and
    the rest of the record still adjudicates."""
    n = 45
    latest = {
        "sf": "0.1",
        # block 1 (q10..q19) at 3x — timed during the JVM stall
        "queries": {
            f"q{i:02d}": (3.0 if 10 <= i < 20 else 1.0) for i in range(n)
        },
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        "cal_mids_s": [2.0, 2.0, 2.0, 2.0],  # CPU loop saw nothing
        "probe_start_s": 0.15,
        # mids at queries 10/20/30/40; the 6.9 brackets blocks 0-1
        # (a minority of the record) — the JVM saw the stall
        "probe_mids_s": [6.9, 0.15, 0.15, 0.15],
        "probe_end_s": 0.15,
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _probe_anchors(n) + [latest])
    assert gate(history_path=hist) == 0

    # the SAME record without probe stamps is the false positive
    no_probe = {
        k: v for k, v in latest.items() if not k.startswith("probe_")
    }
    _write_history(hist, _probe_anchors(n) + [no_probe])
    assert gate(history_path=hist) == 1


def test_probe_quiet_jitter_never_tightens_or_loosens(tmp_path):
    """Probe stamps inside the quiet-window jitter band (< PROBE_FLOOR)
    contribute factor 1 even when they are multiples of the reference
    — a 0.4 s stamp against a 0.15 s reference is scheduler jitter,
    not contention, and a real regression still trips the gate."""
    n = 10
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 3.0 for i in range(n)},
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        "cal_mids_s": [2.0],
        "probe_start_s": 0.4,
        "probe_mids_s": [0.4],
        "probe_end_s": 0.4,
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _probe_anchors(n) + [latest])
    assert gate(history_path=hist) == 1


def test_pooled_record_skips_per_block_scaling(tmp_path):
    """A record pooled from >1 invocation holds medians spanning
    several calibration windows, so the latest invocation's brackets
    cannot be attributed per block (round-18 advice): the gate falls
    back to whole-run worst-stamp scaling — a mid-run spike makes the
    WHOLE record inconclusive instead of spike-bracket queries only."""
    n = 20
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 1.0 for i in range(n)},
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        "cal_mids_s": [9.0],
        "pooled_invocations": 2,
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _anchors(n) + [latest])
    # whole-run factor = 9.0/2.0 past the cap -> inconclusive exit
    assert gate(history_path=hist) == 3


def test_probe_graduated_loosening_band(tmp_path):
    """The probe dimension is graduated, not binary: a stamp past
    PROBE_FLOOR but short of a full stall loosens the threshold
    (0.75s vs the 0.5s floor anchor -> x1.5) instead of vetoing the
    block — 2.0x values pass at eff 1.5*1.5 = 2.25x, while the same
    record without probe stamps is a plain DRIFT."""
    n = 10
    latest = {
        "sf": "0.1",
        "queries": {f"q{i:02d}": 2.0 for i in range(n)},
        "cal_start_s": 2.0,
        "cal_end_s": 2.0,
        "cal_mids_s": [2.0],
        "probe_start_s": 0.75,
        "probe_mids_s": [0.75],
        "probe_end_s": 0.75,
    }
    hist = str(tmp_path / "h.jsonl")
    _write_history(hist, _probe_anchors(n) + [latest])
    assert gate(history_path=hist) == 0

    no_probe = {
        k: v for k, v in latest.items() if not k.startswith("probe_")
    }
    _write_history(hist, _probe_anchors(n) + [no_probe])
    assert gate(history_path=hist) == 1


def test_pooling_requires_matching_code_fingerprint(tmp_path, monkeypatch):
    """Round-18: pooled medians must not blend runs from different code
    states — an optimization round changes query code mid-round, and a
    median over pre- and post-change runs describes neither codebase.
    Records with a different (or absent) ``code`` stamp stay in history
    but never pool."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    hist = tmp_path / "hist.jsonl"
    _write_history(
        hist,
        [
            # same code: pools
            {"round": "r18", "code": "abc1234", "mode": "headline", "sf": 0.1,
             "runs": {"q01": [5.0, 5.0, 5.0]}},
            # older code state: must NOT pool
            {"round": "r18", "code": "def5678", "mode": "headline", "sf": 0.1,
             "runs": {"q01": [50.0, 50.0, 50.0]}},
            # pre-fingerprint record (no code key): must NOT pool
            {"round": "r18", "mode": "headline", "sf": 0.1,
             "runs": {"q01": [50.0, 50.0, 50.0]}},
        ],
    )
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    pooled, invocations = bench._pooled_medians(
        "r18", "headline", 0.1, {"q01": [1.0, 1.0, 1.0]}, {"q01"}, code="abc1234"
    )
    assert invocations == 2
    # median over [1,1,1,5,5,5] = 3.0; the 50s never contribute
    assert pooled["q01"] == 3.0


def test_pooling_requires_matching_core_count(tmp_path, monkeypatch):
    """Round-18: the driver benches the SAME code at multiple core
    counts to measure scaling — a median blending local[32] and
    local[8] runs describes neither machine size. Records with a
    different (or absent) ``cpus`` stamp stay in history but never
    pool."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    hist = tmp_path / "hist.jsonl"
    _write_history(
        hist,
        [
            # same code + same cpus: pools
            {"round": "r18", "code": "abc1234", "cpus": 32, "mode": "headline",
             "sf": 0.1, "runs": {"q01": [5.0, 5.0, 5.0]}},
            # same code, LOWER core count: must NOT pool
            {"round": "r18", "code": "abc1234", "cpus": 8, "mode": "headline",
             "sf": 0.1, "runs": {"q01": [50.0, 50.0, 50.0]}},
            # same code, pre-stamp record (no cpus key): must NOT pool
            {"round": "r18", "code": "abc1234", "mode": "headline",
             "sf": 0.1, "runs": {"q01": [50.0, 50.0, 50.0]}},
        ],
    )
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    pooled, invocations = bench._pooled_medians(
        "r18", "headline", 0.1, {"q01": [1.0, 1.0, 1.0]}, {"q01"},
        code="abc1234", cpus=32,
    )
    assert invocations == 2
    assert pooled["q01"] == 3.0


def test_code_fingerprint_distinguishes_dirty_states(tmp_path):
    """Round-19 ADVICE fix: two DIFFERENT uncommitted edits at the same
    HEAD must get DIFFERENT fingerprints (``--dirty`` stamped them
    identically, so mid-round pre/post-change runs still pooled), and a
    clean tree keeps the bare short-hash stamp (compatible with
    clean-tree history records)."""
    import subprocess

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"},
        )

    git("init", "-q")
    (repo / "f.py").write_text("x = 1\n")
    git("add", "f.py")
    git("commit", "-qm", "init")

    clean = bench._code_fingerprint(cwd=str(repo))
    assert clean is not None and "-dirty" not in clean

    (repo / "f.py").write_text("x = 2\n")
    dirty_a = bench._code_fingerprint(cwd=str(repo))
    (repo / "f.py").write_text("x = 3\n")
    dirty_b = bench._code_fingerprint(cwd=str(repo))

    assert dirty_a is not None and dirty_a.startswith(clean + "-dirty.")
    assert dirty_b is not None and dirty_b.startswith(clean + "-dirty.")
    assert dirty_a != dirty_b  # distinct uncommitted states, distinct stamps
