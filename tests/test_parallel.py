"""Mesh-parallel federated round vs host-side sequential aggregation.

Golden equivalence: one shard_map round over an 8-device CPU mesh must
reproduce (a) per-client local SGD, (b) group-weighted FedAvg, (c) EMA blend
with shared_half_s, (d) prompt personalization — exactly as the host-side
fed.aggregate path computes them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fairfedmed_tpu.core.mesh import CLIENT_AXIS, DATA_AXIS
from fairfedmed_tpu.fed.aggregate import average_weights_ema
from fairfedmed_tpu.fed.parallel import make_parallel_round, shard_stacked, stack_clients

C, G, RANK = 4, 3, 4
D_IN, N_CTX = 8, 2


def _make_client(seed):
    rng = np.random.default_rng(seed)
    return {
        "prompt_learner": {"ctx": jnp.asarray(rng.normal(size=(2, N_CTX, D_IN)), jnp.float32)},
        "adapter": {
            "lora_S": jnp.asarray(rng.normal(size=(G, RANK)), jnp.float32),
            "lora_A": jnp.asarray(rng.normal(size=(D_IN, RANK)), jnp.float32),
        },
    }


def _loss(t, batch):
    x, y = batch["x"], batch["y"]
    w = t["adapter"]["lora_A"] @ t["adapter"]["lora_S"].mean(0)[:, None]  # [D_IN,1]
    pred = (x @ w)[:, 0] + t["prompt_learner"]["ctx"].mean()
    return jnp.mean((pred - y) ** 2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_parallel_round_matches_host_aggregation():
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]).reshape(4, 1),
                             (CLIENT_AXIS, DATA_AXIS))
    tx = optax.sgd(0.1)

    def local_step(t, o, frozen, batch):
        loss, grads = jax.value_and_grad(_loss)(t, batch)
        updates, o = tx.update(grads, o, t)
        return optax.apply_updates(t, updates), o, loss

    clients = [_make_client(i) for i in range(C)]
    global_t = _make_client(99)
    opt_states = [tx.init(c) for c in clients]

    rng = np.random.default_rng(0)
    batches = {
        "x": jnp.asarray(rng.normal(size=(C, 2, 8, D_IN)), jnp.float32),  # 2 steps x batch 8
        "y": jnp.asarray(rng.normal(size=(C, 2, 8)), jnp.float32),
    }
    counts = np.array([10, 20, 30, 40], np.float64)
    weights = jnp.asarray(counts / counts.sum(), jnp.float32)
    by_attr = np.array([[1, 2, 3], [4, 5, 6], [2, 2, 2], [3, 1, 4]], np.float64)
    group_w = jnp.asarray(by_attr / by_attr.sum(0, keepdims=True), jnp.float32)
    epoch, max_epoch = 5, 50
    beta_decay = jnp.float32(0.999 * epoch / max_epoch)

    round_fn = make_parallel_round(mesh, local_step, num_groups=G, avg_prompt=1,
                                   local_s=False, shared_half_s=True)
    new_t, new_o, new_global, loss = round_fn(
        shard_stacked(stack_clients(clients), mesh),
        shard_stacked(stack_clients(opt_states), mesh),
        {}, global_t, batches, weights, group_w, beta_decay)

    # ---- host-side replay -------------------------------------------------
    host_clients = []
    for i in range(C):
        t, o = clients[i], opt_states[i]
        for s in range(2):
            batch = {"x": batches["x"][i, s], "y": batches["y"][i, s]}
            t, o, _ = local_step(t, o, {}, batch)
        host_clients.append(t)

    flat = [
        {"prompt_learner.ctx": np.asarray(t["prompt_learner"]["ctx"]),
         "adapter.lora_S": np.asarray(t["adapter"]["lora_S"]),
         "adapter.lora_A": np.asarray(t["adapter"]["lora_A"])}
        for t in host_clients
    ]
    g_flat = {"prompt_learner.ctx": np.asarray(global_t["prompt_learner"]["ctx"]),
              "adapter.lora_S": np.asarray(global_t["adapter"]["lora_S"]),
              "adapter.lora_A": np.asarray(global_t["adapter"]["lora_A"])}
    expect = average_weights_ema(g_flat, flat, list(range(C)), counts.tolist(),
                                 by_attr.tolist(), epoch, max_epoch,
                                 shared_half_s=True)

    np.testing.assert_allclose(np.asarray(new_global["adapter"]["lora_S"]),
                               expect["adapter.lora_S"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_global["adapter"]["lora_A"]),
                               expect["adapter.lora_A"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_global["prompt_learner"]["ctx"]),
                               expect["prompt_learner.ctx"], rtol=2e-4, atol=1e-5)

    # personalization: client i keeps its own local prompt rows [1:]
    for i in range(C):
        got = np.asarray(new_t["prompt_learner"]["ctx"][i])
        np.testing.assert_allclose(got[0], expect["prompt_learner.ctx"][0], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            got[1], np.asarray(host_clients[i]["prompt_learner"]["ctx"][1]),
            rtol=2e-4, atol=1e-5)


def test_dist_helpers():
    """Topology helpers (fed/dist.py vs Dassl/dassl/engine/utils.py:22-65)."""
    import jax
    from fairfedmed_tpu.fed.dist import (
        data_parallel_sharding, get_local_device_count, get_rank,
        get_world_size, is_main_process, make_data_parallel_mesh,
        replicated_sharding,
    )

    assert get_world_size() >= 1 and get_rank() == 0 and is_main_process()
    assert get_local_device_count() >= 1
    mesh = make_data_parallel_mesh()
    sh = data_parallel_sharding(mesh)
    rep = replicated_sharding(mesh)
    x = jax.device_put(jax.numpy.zeros((8, 4)), sh)
    y = jax.device_put(jax.numpy.zeros((4,)), rep)
    assert x.shape == (8, 4) and y.sharding.is_fully_replicated


def test_parallel_round_rejects_client_shard_mismatch():
    """More stacked clients than client-axis shards must raise, not silently
    drop clients (fed/parallel.py checked wrapper)."""
    import optax
    from fairfedmed_tpu.fed.parallel import make_parallel_round, stack_clients

    n_dev = min(4, len(jax.devices()))
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev, 1),
                             (CLIENT_AXIS, DATA_AXIS))
    tx = optax.sgd(0.1)
    round_fn = make_parallel_round(mesh, lambda t, o, f, b: (t, o, jnp.float32(0.0)))
    clients = [_make_client(i) for i in range(n_dev * 2)]  # 2x too many
    stacked = stack_clients(clients)
    opt = stack_clients([tx.init(c) for c in clients])
    batches = {"x": jnp.zeros((n_dev * 2, 1, 2, D_IN)), "y": jnp.zeros((n_dev * 2, 1, 2))}
    w = jnp.full((n_dev * 2,), 1.0 / (n_dev * 2))
    gw = jnp.full((n_dev * 2, G), 1.0 / (n_dev * 2))
    with pytest.raises(ValueError, match="shards"):
        round_fn(stacked, opt, {}, clients[0], batches, w, gw, jnp.float32(0.0))


def test_decode_loader_uint8_for_integral_pixels():
    """Integral-valued pixel sets cache as uint8 (bit-exact after the
    in-step astype(float32), 4x less transfer/HBM); float-valued sets —
    e.g. host-resized images — must stay fp32."""
    from fairfedmed_tpu.fed.parallel_driver import ParallelRoundRunner

    class _DS:
        def __init__(self, integral):
            self.integral = integral

        def __len__(self):
            return 3

        def load_item(self, i):
            img = np.arange(12, dtype=np.float32).reshape(3, 2, 2) + i
            if not self.integral:
                img = img + 0.5
            return img, 1, np.asarray([0, 1], np.int32)

    class _Loader:
        transform = None
        sampler = None

        def __init__(self, integral):
            self.dataset = _DS(integral)

    runner = object.__new__(ParallelRoundRunner)
    runner._cache_budget = 1 << 30
    runner._cached_bytes = 0

    imgs, labels, attrs = runner._decode_loader(_Loader(integral=True))
    assert imgs.dtype == np.uint8
    np.testing.assert_array_equal(
        imgs.astype(np.float32),
        np.stack([np.arange(12, dtype=np.float32).reshape(3, 2, 2) + i
                  for i in range(3)]))

    imgs_f, _, _ = runner._decode_loader(_Loader(integral=False))
    assert imgs_f.dtype == np.float32
