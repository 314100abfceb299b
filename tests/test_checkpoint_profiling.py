"""Orbax pytree checkpointing + profiling utilities."""

import os

import jax.numpy as jnp
import numpy as np

from fairfedmed_tpu.train.checkpoint import latest_step, load_pytree, save_pytree
from fairfedmed_tpu.utils.profiling import HostTimers, profile_trace


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.int32)}}
    path = save_pytree(str(tmp_path / "ckpt"), tree, step=3)
    assert latest_step(str(tmp_path / "ckpt")) == 3
    restored = load_pytree(path)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]),
                                  np.asarray(tree["nested"]["b"]))


def test_latest_step_empty(tmp_path):
    assert latest_step(str(tmp_path / "missing")) is None
    os.makedirs(tmp_path / "empty")
    assert latest_step(str(tmp_path / "empty")) is None


def test_host_timers():
    t = HostTimers()
    with t.timed("round"):
        pass
    with t.timed("round"):
        pass
    assert len(t.laps["round"]) == 2
    assert "round" in t.summary()


def test_profile_trace_smoke(tmp_path):
    # must not raise even if the backend rejects profiling
    with profile_trace(str(tmp_path / "prof")):
        _ = jnp.ones((8,)) * 2
