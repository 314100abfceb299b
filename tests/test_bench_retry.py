"""bench.py's retry-once-in-a-fresh-subprocess machinery.

Round 2 shipped with NO perf artifact because a single transient tunnel
error (FAILED_PRECONDITION) killed the un-retried bench process; the
orchestrator now runs each measured section in its own subprocess and
retries once (CLAUDE.md: "the tunnel stalls intermittently — retry once").
These tests exercise that machinery with fault injection — no TPU needed.
"""

import os
import tempfile
import uuid

import pytest

pytestmark = pytest.mark.smoke

import bench  # noqa: E402  (repo root is on sys.path via conftest cwd)


def test_run_section_retries_transient_failure(monkeypatch):
    name = f"bench_selftest_{uuid.uuid4().hex[:8]}"
    monkeypatch.setenv("BENCH_SELFTEST_MARKER", name)
    marker = os.path.join(tempfile.gettempdir(), name)
    rec, attempts, err = bench._run_section("selftest_flaky", timeout_s=120)
    assert rec == {"metric": "selftest", "value": 1.0, "unit": "ok"}
    assert attempts == 2  # first attempt died, the retry landed
    assert err is None
    assert not os.path.exists(marker)


def test_run_section_gives_up_after_two_failures(monkeypatch, tmp_path):
    # a marker whose parent dir does not exist -> creating it fails on BOTH
    # attempts -> the section reports the error instead of a record
    monkeypatch.setenv("BENCH_SELFTEST_MARKER",
                       os.path.join(str(tmp_path), "never", "nested"))
    rec, attempts, err = bench._run_section("selftest_flaky", timeout_s=120)
    assert rec is None
    assert attempts == 2
    assert err is not None and "rc=" in err


def test_unknown_mode_is_an_error():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, bench.__file__],
        env=dict(os.environ, BENCH_MODE="no_such_mode"),
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "unknown BENCH_MODE" in proc.stderr


def test_orchestrate_flushes_after_every_section(monkeypatch, capsys):
    # round-3 post-mortem: the driver timeout killed bench.py before ONE byte
    # of output (BENCH_r03.json rc=124, empty tail).  The orchestrator must
    # now print the merged record after EVERY section so any kill point still
    # leaves the newest snapshot on stdout.
    import json as _json

    calls = []

    def fake_section(mode, timeout_s, remaining_s=None):
        calls.append((mode, timeout_s))
        if mode == "step":
            return {"metric": "m", "value": 100.0, "unit": "u",
                    "vs_baseline": 2.0, "mfu": 0.5}, 1, None
        return {"value": 50.0, "vs_baseline": 5.0,
                "baseline_round_imgs_per_sec": 10.0,
                "fixture": {"users": 2}}, 1, None

    monkeypatch.setattr(bench, "_run_section", fake_section)
    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    for k in ("BENCH_SKIP_ROUND", "BENCH_SKIP_PROD", "BENCH_SKIP_OCT",
              "BENCH_SKIP_RN50"):
        monkeypatch.delenv(k, raising=False)
    rec = bench.orchestrate()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    # one line after the step section + one after each of the 4 round sections
    assert len(lines) == 5
    parsed = [_json.loads(l) for l in lines]
    assert parsed[0]["value"] == 100.0 and parsed[0]["mfu"] == 0.5
    # every later line is a superset snapshot; the last parseable line (what
    # the driver keeps) carries everything
    last = parsed[-1]
    assert last["value"] == 100.0
    assert last["round_prod_imgs_per_sec"] == 50.0
    assert last["round_vs_baseline_round"] == 5.0
    assert [m for m, _ in calls] == [
        "step", "round_prod", "round_oct", "round_rn50", "round"]
    assert rec == last


def test_orchestrate_skips_sections_outside_budget(monkeypatch, capsys):
    import json as _json
    import time as _time

    def slow_step(mode, timeout_s, remaining_s=None):
        assert mode == "step"
        # eat the whole budget: later sections must be SKIPPED, not attempted
        fake_now[0] += 10_000
        return {"metric": "m", "value": 1.0, "unit": "u",
                "vs_baseline": 1.0}, 1, None

    fake_now = [0.0]
    monkeypatch.setattr(bench, "_run_section", slow_step)
    monkeypatch.setattr(_time := bench.time, "monotonic",
                        lambda: fake_now[0])
    monkeypatch.setenv("BENCH_BUDGET_S", "1000")
    for k in ("BENCH_SKIP_ROUND", "BENCH_SKIP_PROD", "BENCH_SKIP_OCT",
              "BENCH_SKIP_RN50"):
        monkeypatch.delenv(k, raising=False)
    rec = bench.orchestrate()
    out = capsys.readouterr().out.strip().splitlines()
    last = _json.loads(out[-1])
    assert last["value"] == 1.0  # headline survived
    for prefix in ("round_prod", "round_oct", "round_rn50", "round"):
        assert last[f"{prefix}_skipped"] == "budget"
        assert f"{prefix}_imgs_per_sec" not in last
    assert rec == last


def test_retry_attempt_gets_stretched_timeout(monkeypatch):
    # a cold-cache round_prod retry measured 575 s of its 600 s slice: the
    # retry now stretches to min(remaining - 10, 1.5x slice) when the budget
    # allows, instead of re-running with the exact nominal slice
    seen = []

    class _Proc:
        returncode = 1
        stdout = ""
        stderr = "injected failure"

    def fake_run(cmd, cwd=None, env=None, capture_output=None, text=None,
                 timeout=None):
        seen.append(timeout)
        return _Proc()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rec, attempts, err = bench._run_section(
        "step", timeout_s=600, remaining_s=lambda: 2000.0)
    assert rec is None and attempts == 2
    assert seen == [600, 900]  # 1.5x slice, budget permits

    seen.clear()
    rec, attempts, err = bench._run_section(
        "step", timeout_s=600, remaining_s=lambda: 700.0)
    assert seen == [600, 690]  # capped by remaining - 10


def test_run_section_denies_retry_without_budget(monkeypatch):
    # first attempt fails; remaining budget can't cover a second full attempt
    monkeypatch.setenv("BENCH_SELFTEST_MARKER",
                       os.path.join(tempfile.gettempdir(), "never", "nested"))
    rec, attempts, err = bench._run_section(
        "selftest_flaky", timeout_s=120, remaining_s=lambda: 60.0)
    assert rec is None
    assert attempts == 1
    assert "no budget for retry" in err
