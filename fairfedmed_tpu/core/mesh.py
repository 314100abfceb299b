"""Device-mesh construction for federated client parallelism.

The reference time-multiplexes simulated FL clients on one GPU
(federated_main.py:616-626).  The TPU-native design instead lays clients out on
a ``clients`` mesh axis (each client's trainable parameters stacked on a leading
axis and sharded over ICI) with an inner ``data`` axis for per-client batch
parallelism; FedAvg/EMA aggregation becomes a weighted reduction over the
``clients`` axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CLIENT_AXIS = "clients"
DATA_AXIS = "data"


def build_mesh(num_clients: int | None = None, devices=None) -> Mesh:
    """Build a ``(clients, data)`` mesh over the available devices.

    The client axis gets as many devices as evenly divide into the device count
    (capped at ``num_clients``); remaining devices form the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_clients is None:
        c = n
    else:
        c = min(num_clients, n)
        while c > 1 and (n % c != 0 or num_clients % c != 0):
            c -= 1
    d = n // c
    arr = np.asarray(devices[: c * d]).reshape(c, d)
    return Mesh(arr, (CLIENT_AXIS, DATA_AXIS))


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for client-stacked pytrees: leading axis over ``clients``."""
    return NamedSharding(mesh, P(CLIENT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[clients, batch, ...] arrays: clients over the client axis, batch over data."""
    return NamedSharding(mesh, P(CLIENT_AXIS, DATA_AXIS))
