"""Client-parallel federated training over a TPU device mesh.

The reference time-multiplexes FL clients on one GPU — the server loop loads
each client's weights, trains, harvests, then averages on host
(federated_main.py:616-633).  The TPU-native execution model instead:

* stacks every client's TRAINABLE pytree on a leading axis sharded over the
  ``clients`` mesh axis (one client's adapters/prompts per mesh slice);
* the frozen CLIP backbone is replicated — it is read-only and identical
  everywhere;
* one ``shard_map``-compiled program runs a full federated round: each slice
  trains its client on its own batch stream, then FedAvg/EMA aggregation
  happens ON-DEVICE as a weighted ``psum`` over the ICI ring — the
  `'lora_S'`-keyed group weighting (utils/fed_utils.py:29) becomes a psum with
  per-group weights, ``shared_half_s`` a mean over the group axis;
* personalization (keep local prompt rows / local lora_S,
  federated_main.py:645-652) is a masked blend applied per-slice after the
  collective — no host round-trip anywhere in the round.

This module is model-agnostic: it works over any (trainable, opt_state, batch)
triple given a per-client ``local_step`` function and dotted-path metadata.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import CLIENT_AXIS, DATA_AXIS
from ..core.pytree import map_with_path


def client_weighted_mean(tree, weight: jnp.ndarray,
                         group_weights: Optional[jnp.ndarray],
                         num_groups: int, axis_name: str = CLIENT_AXIS):
    """Weighted psum over the client axis (average_weights semantics).

    weight: this client's scalar n_k/N; group_weights: [num_groups] vector of
    n_{k,g}/N_g for lora_S leaves (or None to disable group weighting).
    """

    def agg(path, x):
        if (group_weights is not None and "lora_S" in path
                and x.ndim >= 2 and x.shape[-2] == num_groups):
            w = group_weights.reshape((1,) * (x.ndim - 2) + (num_groups, 1))
            return jax.lax.psum(x * w.astype(x.dtype), axis_name)
        return jax.lax.psum(x * jnp.asarray(weight, x.dtype), axis_name)

    return map_with_path(agg, tree)


def apply_shared_half_s(tree, num_groups: int):
    """First half of every group's singular vector ← cross-group mean
    (fed_utils.py:90-96).  Applies to leaves shaped [..., num_groups, rank]."""

    def fn(path, x):
        if "lora_S" in path and x.ndim >= 2 and x.shape[-2] == num_groups:
            rank = x.shape[-1]
            head = x[..., : rank // 2].mean(axis=-2, keepdims=True)
            head = jnp.broadcast_to(head, x[..., : rank // 2].shape)
            return jnp.concatenate([head, x[..., rank // 2 :]], axis=-1)
        return x

    return map_with_path(fn, tree)


def ema_blend(avg_tree, global_tree, beta_decay):
    return jax.tree_util.tree_map(
        lambda a, g: (1.0 - beta_decay) * a.astype(jnp.float32)
        + beta_decay * g.astype(jnp.float32), avg_tree, global_tree)


def personalize(new_global, local_tree, avg_prompt: int, local_s: bool):
    """Per-client blend after aggregation (federated_main.py:645-652):
    global prompt rows [:avg_prompt] from the aggregate, local rows kept;
    lora_S kept fully local when LOCAL_S."""

    def fn(path, g):
        loc = _get_by_path(local_tree, path)
        if path.endswith("prompt_learner.ctx"):
            return jnp.concatenate([g[:avg_prompt], loc[avg_prompt:]], axis=0)
        if local_s and "lora_S" in path:
            return loc
        return g

    return map_with_path(fn, new_global)


def _get_by_path(tree, path, sep="."):
    node = tree
    for p in path.split(sep):
        node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
    return node


def make_parallel_round(
    mesh: Mesh,
    local_step: Callable,
    num_groups: int = 1,
    avg_prompt: int = 1,
    local_s: bool = False,
    shared_half_s: bool = False,
    use_group_weighting: bool = True,
    batch_spec=None,
):
    """Compile one federated round as a single SPMD program.

    ``local_step(trainable, opt_state, frozen, batch) -> (trainable, opt_state,
    loss)`` runs one client's local update for one batch; the round scans it
    over the per-client batch stream, then aggregates.

    Returns ``round_fn(stacked_trainable, stacked_opt_state, frozen, global_t,
    stacked_batches, weights, group_weights, beta_decay)``; stacked inputs have
    a leading client axis sharded over the mesh.
    """

    def per_client(trainable, opt_state, frozen, global_t, batches, weight,
                   group_weight, beta_decay):
        # drop the size-1 client axis inside the shard
        trainable, opt_state, batches = jax.tree_util.tree_map(
            lambda x: x[0], (trainable, opt_state, batches))
        weight = weight[0]
        group_weight = group_weight[0] if group_weight is not None else None

        def body(carry, batch):
            t, o = carry
            t, o, loss = local_step(t, o, frozen, batch)
            return (t, o), loss

        (trainable, opt_state), losses = jax.lax.scan(body, (trainable, opt_state), batches)

        # --- aggregation over ICI -----------------------------------------
        avg = client_weighted_mean(
            trainable, weight,
            group_weight if use_group_weighting else None, num_groups)
        if shared_half_s:
            avg = apply_shared_half_s(avg, num_groups)
        new_global = ema_blend(avg, global_t, beta_decay)
        new_global = jax.tree_util.tree_map(
            lambda g, t: g.astype(t.dtype), new_global, trainable)

        # --- per-client personalization ------------------------------------
        personal = personalize(new_global, trainable, avg_prompt, local_s)

        # restore the client axis for the sharded outputs
        add_axis = lambda x: x[None]
        return (
            jax.tree_util.tree_map(add_axis, personal),
            jax.tree_util.tree_map(add_axis, opt_state),
            new_global,
            jax.lax.pmean(losses.mean(), CLIENT_AXIS),
        )

    c_spec = P(CLIENT_AXIS)
    r_spec = P()
    b_spec = batch_spec if batch_spec is not None else c_spec
    round_fn = jax.shard_map(
        per_client,
        mesh=mesh,
        in_specs=(c_spec, c_spec, r_spec, r_spec, b_spec, c_spec, c_spec, r_spec),
        out_specs=(c_spec, c_spec, r_spec, r_spec),
        check_vma=False,
    )
    jitted = jax.jit(round_fn)
    n_client_shards = mesh.shape[CLIENT_AXIS]

    def checked(stacked_trainable, stacked_opt_state, frozen, global_t,
                stacked_batches, weights, group_weights, beta_decay):
        # per_client drops the size-1 client axis with x[0]; more clients than
        # client-axis shards would silently discard all but the first in each
        # shard and aggregate with wrong weights
        n = jax.tree_util.tree_leaves(stacked_trainable)[0].shape[0]
        if n != n_client_shards:
            raise ValueError(
                f"{n} stacked clients but the mesh has {n_client_shards} "
                f"'{CLIENT_AXIS}' shards — stack exactly one client per shard")
        return jitted(stacked_trainable, stacked_opt_state, frozen, global_t,
                      stacked_batches, weights, group_weights, beta_decay)

    return checked


def make_client_train_round(mesh: Mesh, local_step: Callable, batch_spec=None):
    """Compile per-client local training as one SPMD program over the mesh.

    Generalizes :func:`make_parallel_round`'s training half for the product
    path (fed/parallel_driver.py): supports MORE stacked clients than client-
    axis shards (extra co-located clients SCAN sequentially inside their
    shard, keeping each step at the throughput-optimal per-client batch —
    see the in-body measurement note) and RAGGED per-client batch streams
    via a padded scan with an ``n_steps`` mask (padded steps leave
    parameters, optimizer state and metrics untouched).

    ``local_step(trainable, opt_state, frozen, batch) -> (trainable, opt_state,
    metrics)`` runs one client's update for one batch.  Returns
    ``train_fn(stacked_trainable, stacked_opt_state, frozen, stacked_batches,
    n_steps) -> (stacked_trainable, stacked_opt_state, stacked_metrics)`` where
    stacked inputs carry a leading client axis of size C (divisible by the
    mesh's client-shard count) and batches are ``[C, S, B, ...]``.

    Aggregation/EMA/personalization deliberately live OUTSIDE this program —
    they are cheap tree ops over the stacked client axis that XLA lowers to
    ICI collectives on its own under jit with client-sharded inputs
    (fed/parallel_driver.py), and keeping them separate lets frac-sampled
    rounds train a subset while personalization touches all clients.
    """

    def per_shard(trainable, opt_state, frozen, batches, n_steps):
        # leading axis = this shard's local clients (k ≥ 1)
        def train_one(t, o, bstream, nsteps):
            def body(carry, xs):
                i, batch = xs
                t, o = carry
                t2, o2, metrics = local_step(t, o, frozen, batch)
                valid = i < nsteps
                keep = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(valid, a, b), new, old)
                return ((keep(t2, t), keep(o2, o)),
                        jnp.where(valid, metrics, jnp.zeros_like(metrics)))

            n_total = jax.tree_util.tree_leaves(bstream)[0].shape[0]
            (t, o), ms = jax.lax.scan(body, (t, o),
                                      (jnp.arange(n_total), bstream))
            return t, o, ms

        # Clients co-located on one shard run SEQUENTIALLY (scan), not
        # vmapped: vmapping k clients widens every step to k×batch, and the
        # remat-bound ViT step LOSES throughput with batch (measured on
        # v5e, attn_res remat: 1048 img/s at batch 32 vs 847 at 64 —
        # saved-activation HBM traffic dominates).  Per-client math is
        # identical either way; on a
        # real pod slice the client axis shards over ICI and k is 1.
        k = jax.tree_util.tree_leaves(n_steps)[0].shape[0]
        if k == 1:
            return jax.vmap(train_one)(trainable, opt_state, batches, n_steps)

        def client_body(_, xs):
            t, o, bstream, nsteps = xs
            return None, train_one(t, o, bstream, nsteps)

        _, (t, o, ms) = jax.lax.scan(
            client_body, None, (trainable, opt_state, batches, n_steps))
        return t, o, ms

    c_spec = P(CLIENT_AXIS)
    b_spec = batch_spec if batch_spec is not None else P(CLIENT_AXIS, None, DATA_AXIS)
    train_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(c_spec, c_spec, P(), b_spec, c_spec),
        out_specs=(c_spec, c_spec, c_spec),
        check_vma=False,
    )
    return jax.jit(train_fn, donate_argnums=(0, 1))


def stack_clients(trees):
    """List of per-client pytrees → one pytree with leading client axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def shard_stacked(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P(CLIENT_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
