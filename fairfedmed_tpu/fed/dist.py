"""Multi-process / multi-host topology helpers.

Capability parity with the reference's torch.distributed helpers
(``Dassl/dassl/engine/utils.py:22-65`` — world size / rank / local rank /
is_main_process) and its ``create_ddp_model`` wrapper
(``Dassl/dassl/engine/trainer.py:26-45``, inert at world_size 1).  On TPU the
process group is JAX's multi-controller runtime: one Python process per host,
devices addressed globally; "DDP" is not a model wrapper but a sharding — data
parallelism comes from placing the batch axis on a mesh axis, and gradient
all-reduce is the ``psum`` XLA inserts for it (see ``fed/parallel.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def get_world_size() -> int:
    """Number of participating controller processes (1 when single-host)."""
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    """Rank within this host — always equal to process_index under JAX's
    one-process-per-host model."""
    return jax.process_index()


def get_local_size() -> int:
    """Processes per machine — 1 under JAX's one-process-per-host model;
    per-host parallelism is device-level, see local_device_count."""
    return 1


def get_local_device_count() -> int:
    return jax.local_device_count()


def get_global_device_count() -> int:
    return jax.device_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def data_parallel_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """The DDP equivalent: batch dim sharded over ``axis``, everything else
    replicated.  Apply with ``jax.device_put(batch, sharding)`` or as jit
    in_shardings; XLA inserts the gradient psum (create_ddp_model's role)."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def make_data_parallel_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` (all local by default)."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
