"""Tunnel stall watchdog (utils/tunnel.py).

The axon relay intermittently wedges mid-RPC (observed: 556 s inside one
~100 KB fetch, cleared the instant a second process touched the relay).
These tests pin the watchdog's gating and its socket poke; the jax-probe
escalation is exercised with a stub executable.
"""

import os
import socket
import threading

import pytest

from fairfedmed_tpu.utils import profiling, tunnel


pytestmark = pytest.mark.smoke


def test_disabled_without_env(monkeypatch):
    monkeypatch.delenv("FAIRFEDMED_TUNNEL_POKER", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert tunnel.start_tunnel_poker() is None


def test_disabled_without_axon_relay(monkeypatch):
    monkeypatch.setenv("FAIRFEDMED_TUNNEL_POKER", "1")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert tunnel.start_tunnel_poker() is None


def test_poke_sockets_connects_and_counts():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    accepted = []

    def accept_one():
        try:
            c, _ = srv.accept()
            accepted.append(True)
            c.close()
        except OSError:
            pass

    t = threading.Thread(target=accept_one, daemon=True)
    t.start()
    # one live port + one dead port: count reflects only successful connects
    dead = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    dead.bind(("127.0.0.1", 0))
    dead_port = dead.getsockname()[1]
    dead.close()  # bound then closed: nothing listens there now
    assert tunnel._poke_sockets([port, dead_port]) == 1
    t.join(timeout=5)
    assert accepted == [True]
    srv.close()


def test_heartbeat_age_resets():
    profiling.heartbeat()
    assert profiling.heartbeat_age() < 1.0


def test_stamp_updates_heartbeat_even_when_prints_disabled(monkeypatch):
    monkeypatch.delenv("FAIRFEDMED_TIMING", raising=False)
    monkeypatch.delenv("FAIRFEDMED_BUILD_STAMPS", raising=False)
    profiling._heartbeat[0] -= 1000.0
    assert profiling.heartbeat_age() > 999.0
    profiling.stamp("test")  # silent, but still a progress milestone
    assert profiling.heartbeat_age() < 1.0


def test_poke_subprocess_bounded(monkeypatch):
    # stub out the real jax probe with a trivial command
    calls = {}

    def fake_run(cmd, stdout=None, stderr=None, timeout=None):
        calls["timeout"] = timeout
        return None

    monkeypatch.setattr(tunnel.subprocess, "run", fake_run)
    assert tunnel._poke_subprocess(timeout_s=7.0) is True
    assert calls["timeout"] == 7.0
