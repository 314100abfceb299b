"""bench.py's combined-subprocess orchestration machinery.

Round 2 shipped with NO perf artifact because a single transient tunnel
error (FAILED_PRECONDITION) killed the un-retried bench process; round 4
lost its RN50 number because five per-section subprocesses meant five
independent first-fetch stall lotteries (measured 42-395 s each).  The
orchestrator now runs ALL sections in ONE ``BENCH_MODE=all`` child, streams
its per-section JSON lines, salvages completed sections on a timeout/crash,
and retries only the missing ones.  These tests exercise that machinery
with fault injection — no TPU needed.
"""

import json
import os
import tempfile
import uuid

import pytest

pytestmark = pytest.mark.smoke

import bench  # noqa: E402  (repo root is on sys.path via conftest cwd)


def _stream(sections, timeout_s=120):
    got = {}
    done, errors, err = bench._stream_sections(
        sections, timeout_s, lambda name, rec: got.__setitem__(name, rec))
    return got, done, errors, err


def test_stream_sections_runs_and_tags_sections():
    got, done, errors, err = _stream(["selftest_ok"])
    assert err is None and errors == {}
    assert done == {"selftest_ok"}
    assert got["selftest_ok"] == {
        "metric": "selftest_ok", "value": 1.0, "unit": "ok"}


def test_stream_sections_salvages_before_transient_death(monkeypatch):
    # the child completes selftest_ok, then dies (exit 3) inside
    # selftest_flaky: the completed section must be SALVAGED and the overall
    # error reported, exactly the timeout-salvage contract
    name = f"bench_selftest_{uuid.uuid4().hex[:8]}"
    monkeypatch.setenv("BENCH_SELFTEST_MARKER", name)
    marker = os.path.join(tempfile.gettempdir(), name)
    try:
        got, done, errors, err = _stream(["selftest_ok", "selftest_flaky"])
        assert done == {"selftest_ok"}
        assert err is not None and "rc=3" in err
        # a fresh child retry (what the orchestrator does) then succeeds
        got, done, errors, err = _stream(["selftest_flaky"])
        assert done == {"selftest_flaky"} and err is None
    finally:
        if os.path.exists(marker):
            os.remove(marker)


def test_stream_sections_kills_a_hung_child():
    got, done, errors, err = _stream(["selftest_ok", "selftest_hang"],
                                     timeout_s=8)
    assert done == {"selftest_ok"}  # completed-before-hang is salvaged
    assert err is not None and "timeout" in err


def test_stream_sections_stall_watch_fires_before_the_deadline(monkeypatch):
    # a child that completes one section then goes silent must be killed by
    # the STALL WATCH well before the hard deadline, so the orchestrator's
    # remaining budget can fund a retry child — without the watch, a hung
    # section's timeout eats the entire remaining budget and the
    # rotate-and-retry path is unreachable (how r04 lost its RN50 section)
    import time

    monkeypatch.setenv("BENCH_OUTPUT_STALL_S", "4")
    t0 = time.monotonic()
    got, done, errors, err = _stream(["selftest_ok", "selftest_hang"],
                                     timeout_s=600)
    elapsed = time.monotonic() - t0
    assert done == {"selftest_ok"}  # completed-before-stall is salvaged
    assert err is not None and "stalled" in err
    assert elapsed < 120  # killed by the watch, not the 600 s deadline


def test_unknown_mode_is_an_error():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, bench.__file__],
        env=dict(os.environ, BENCH_MODE="no_such_mode"),
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "unknown BENCH_MODE" in proc.stderr

    proc = subprocess.run(
        [sys.executable, bench.__file__],
        env=dict(os.environ, BENCH_MODE="all", BENCH_SECTIONS="nope"),
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "unknown BENCH_SECTIONS" in proc.stderr


def _fake_records():
    return {
        "step": {"metric": "m", "value": 100.0, "unit": "u",
                 "vs_baseline": 2.0, "mfu": 0.5},
        "round_prod": {"value": 50.0, "vs_baseline": 5.0,
                       "baseline_round_imgs_per_sec": 10.0,
                       "fixture": {"users": 2}},
        "round_rn50": {"value": 60.0, "vs_baseline": 6.0,
                       "baseline_round_imgs_per_sec": 10.0,
                       "fixture": {"users": 2}},
        "round_oct": {"value": 40.0, "vs_baseline": 4.0,
                      "baseline_round_imgs_per_sec": 10.0,
                      "fixture": {"users": 2}},
        "round": {"value": 30.0, "vs_baseline": 3.0,
                  "baseline_round_imgs_per_sec": 10.0,
                  "fixture": {"users": 2}},
    }


def _clear_skips(monkeypatch):
    for k in ("BENCH_SKIP_ROUND", "BENCH_SKIP_PROD", "BENCH_SKIP_OCT",
              "BENCH_SKIP_RN50"):
        monkeypatch.delenv(k, raising=False)


def test_orchestrate_flushes_after_every_section(monkeypatch, capsys):
    # round-3 post-mortem: the driver timeout killed bench.py before ONE byte
    # of output (BENCH_r03.json rc=124, empty tail).  The orchestrator must
    # stream the merged record after EVERY section so any kill point still
    # leaves the newest snapshot on stdout.
    recs = _fake_records()
    calls = []

    def fake_stream(section_names, timeout_s, on_record):
        calls.append(list(section_names))
        for s in section_names:
            on_record(s, dict(recs[s]))
        return set(section_names), {}, None

    monkeypatch.setattr(bench, "_stream_sections", fake_stream)
    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    _clear_skips(monkeypatch)
    rec = bench.orchestrate()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    # the second-0 line + one per section + the final summary line
    assert len(lines) == 7
    parsed = [json.loads(l) for l in lines]
    assert parsed[0]["value"] is None  # emitted before any section completed
    assert parsed[1]["value"] == 100.0 and parsed[1]["mfu"] == 0.5
    # every later line is a superset snapshot; the last parseable line (what
    # the driver keeps) carries everything
    last = parsed[-1]
    assert last["value"] == 100.0
    assert last["round_prod_imgs_per_sec"] == 50.0
    assert last["round_rn50_imgs_per_sec"] == 60.0
    assert last["round_oct_imgs_per_sec"] == 40.0
    assert last["round_imgs_per_sec"] == 30.0
    assert last["round_vs_baseline_round"] == 5.0  # prod takes precedence
    assert last["round_vs_step"] == 0.3
    # one combined child, section order: step first, RN50 before OCT
    assert calls == [["step", "round_prod", "round_rn50", "round_oct",
                      "round"]]
    assert rec == last


def test_orchestrate_salvages_and_retries_only_missing(monkeypatch, capsys):
    # child 1 completes step+prod then hangs inside rn50 -> timeout; child 2
    # must be asked ONLY for the missing sections, with the hung one rotated
    # to the END so it can't starve oct/round again
    recs = _fake_records()
    calls = []

    def fake_stream(section_names, timeout_s, on_record):
        calls.append(list(section_names))
        if len(calls) == 1:
            for s in ("step", "round_prod"):
                on_record(s, dict(recs[s]))
            return {"step", "round_prod"}, {}, "timeout after 600s"
        for s in section_names:
            on_record(s, dict(recs[s]))
        return set(section_names), {}, None

    monkeypatch.setattr(bench, "_stream_sections", fake_stream)
    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    _clear_skips(monkeypatch)
    rec = bench.orchestrate()
    assert calls == [
        ["step", "round_prod", "round_rn50", "round_oct", "round"],
        ["round_oct", "round", "round_rn50"],  # hung rn50 rotated to the end
    ]
    assert rec["round_rn50_imgs_per_sec"] == 60.0
    assert rec["round_rn50_retries"] == 1
    assert "round_rn50_error" not in rec
    assert rec["round_oct_imgs_per_sec"] == 40.0


def test_orchestrate_gives_up_after_two_attempts(monkeypatch, capsys):
    # a section that fails in every child ends as <name>_error, and the
    # orchestrator does not loop forever
    recs = _fake_records()
    calls = []

    def fake_stream(section_names, timeout_s, on_record):
        calls.append(list(section_names))
        done = set()
        errors = {}
        for s in section_names:
            if s == "round_oct":
                errors[s] = "ValueError: injected"
            else:
                on_record(s, dict(recs[s]))
                done.add(s)
        return done, errors, None

    monkeypatch.setattr(bench, "_stream_sections", fake_stream)
    monkeypatch.setenv("BENCH_BUDGET_S", "10000")
    _clear_skips(monkeypatch)
    rec = bench.orchestrate()
    assert len(calls) == 2
    assert calls[1] == ["round_oct"]
    assert rec["round_oct_error"] == "ValueError: injected"
    assert "round_oct_imgs_per_sec" not in rec
    assert rec["round_imgs_per_sec"] == 30.0  # the others all landed


def test_orchestrate_skips_sections_outside_budget(monkeypatch, capsys):
    fake_now = [0.0]

    def slow_stream(section_names, timeout_s, on_record):
        # eat the whole budget on the first child: it completes only the
        # step section; later sections must be SKIPPED, not attempted
        fake_now[0] += 10_000
        on_record("step", {"metric": "m", "value": 1.0, "unit": "u",
                           "vs_baseline": 1.0})
        return {"step"}, {}, "timeout after 10000s"

    monkeypatch.setattr(bench, "_stream_sections", slow_stream)
    monkeypatch.setattr(bench.time, "monotonic", lambda: fake_now[0])
    monkeypatch.setenv("BENCH_BUDGET_S", "1000")
    _clear_skips(monkeypatch)
    rec = bench.orchestrate()
    out = capsys.readouterr().out.strip().splitlines()
    last = json.loads(out[-1])
    assert last["value"] == 1.0  # headline survived
    # the in-flight section gets the child's error; the never-started rest
    # are recorded as budget-skipped
    assert "timeout" in last["round_prod_error"]
    for prefix in ("round_rn50", "round_oct", "round"):
        assert last[f"{prefix}_skipped"] == "budget"
        assert f"{prefix}_imgs_per_sec" not in last
    assert rec == last


def test_main_all_reports_section_exception_and_continues(monkeypatch):
    # an in-section Python exception becomes a tagged error line and the
    # NEXT section still runs (only a wedged backend should cost the tail)
    import subprocess
    import sys

    def boom(emit=True):
        raise ValueError("injected")

    monkeypatch.setitem(bench._SECTION_FNS, "selftest_ok", boom)
    # monkeypatching doesn't cross the process boundary -> drive main_all
    # in-process with captured stdout
    import contextlib
    import io

    monkeypatch.setenv("BENCH_SECTIONS", "selftest_ok,selftest_flaky")
    marker = os.path.join(tempfile.gettempdir(),
                          f"bench_selftest_{uuid.uuid4().hex[:8]}")
    monkeypatch.setenv("BENCH_SELFTEST_MARKER", os.path.basename(marker))
    open(marker, "w").close()  # flaky's second-call branch: succeeds
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main_all()
        lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
        assert lines[0]["section"] == "selftest_ok"
        assert "ValueError: injected" in lines[0]["error"]
        assert lines[1]["section"] == "selftest_flaky"
        assert lines[1]["value"] == 1.0
    finally:
        if os.path.exists(marker):
            os.remove(marker)
