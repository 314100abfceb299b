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
