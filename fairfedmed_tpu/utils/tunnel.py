"""Remote-TPU ("axon") tunnel stall watchdog.

The axon attachment multiplexes every PJRT RPC through a local TCP relay
(ports 8082/8083 by default).  Empirically the relay intermittently wedges:
the client process blocks inside a device op with ~0 CPU, zero bytes flow,
and nothing recovers for many minutes (observed: 556 s inside one 100 KB
fetch).  Also empirically: the wedge clears the moment ANOTHER process
touches the relay — a fresh TCP connection (or a throwaway ``jax.devices()``
probe) wakes it within seconds.

``start_tunnel_poker()`` starts a daemon thread that watches the progress
heartbeat (:func:`..utils.profiling.heartbeat`, updated at every round /
cache / build milestone) and, when it goes stale, pokes the relay: first
with bare TCP connects, then — if the stall persists — with a subprocess
that performs one trivial device op.  Poking a healthy-but-busy process is
harmless (a TCP accept + a second tunnel session), so false positives from
long legitimate computations cost nothing.

Enabled only when FAIRFEDMED_TUNNEL_POKER=1 AND the axon relay env
(PALLAS_AXON_POOL_IPS) is present; the bench sets it for its subprocess
sections.  No-op everywhere else (tests, CPU runs, real multi-host pods).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import threading
import time

from .profiling import heartbeat_age

# relay ports: 8082 = stateful session, 8083 = control (jax.devices());
# override with FAIRFEDMED_POKER_PORTS=comma,separated
_DEFAULT_PORTS = (8082, 8083)

_started = [False]


def _poke_sockets(ports) -> int:
    ok = 0
    for port in ports:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            s.close()
            ok += 1
        except OSError:
            pass
    return ok


def _poke_subprocess(timeout_s: float = 120.0) -> bool:
    """One trivial device op in a throwaway process — the empirically
    reliable unwedger.  Bounded; output discarded."""
    code = ("import jax, numpy as np; "
            "print(float(np.asarray(jax.numpy.ones((2,)).sum())))")
    try:
        subprocess.run([sys.executable, "-c", code],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       timeout=timeout_s)
        return True
    except Exception:
        return False


def start_tunnel_poker(stale_s: float = 60.0, interval_s: float = 20.0):
    """Start the watchdog thread (idempotent).  Returns the thread or None
    when disabled."""
    if _started[0]:
        return None
    if os.environ.get("FAIRFEDMED_TUNNEL_POKER") != "1":
        return None
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None
    ports = tuple(
        int(p) for p in
        os.environ.get("FAIRFEDMED_POKER_PORTS", "").split(",") if p.strip()
    ) or _DEFAULT_PORTS

    def loop():
        # None, not 0.0: time.monotonic() is host uptime on Linux, so a
        # bench launched within 120 s of boot would otherwise suppress the
        # first escalation probe exactly in the first-fetch stall window
        last_probe = None
        while True:
            time.sleep(interval_s)
            age = heartbeat_age()
            if age < stale_s:
                continue
            n = _poke_sockets(ports)
            print(f"[tunnel-poker] no progress for {age:.0f}s; "
                  f"poked {n} relay port(s)", file=sys.stderr, flush=True)
            # measured (r4 OCT wedge): socket pokes alone never cleared a
            # wedge; the subprocess device-op probe cleared it within
            # seconds — escalate after one more interval, re-probing at
            # most every 120 s while the stall persists
            now = time.monotonic()
            if age > stale_s + interval_s and (
                    last_probe is None or now - last_probe > 120.0):
                last_probe = now
                print("[tunnel-poker] stall persists; running a probe "
                      "device op in a subprocess", file=sys.stderr, flush=True)
                _poke_subprocess()

    t = threading.Thread(target=loop, name="tunnel-poker", daemon=True)
    t.start()
    _started[0] = True
    return t
