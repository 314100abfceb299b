"""Per-round client sampling (federated_main.py:227-228, 606-613)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def sample_clients(
    num_users: int,
    frac: float,
    epoch: int,
    all_on_first_round: bool = True,
    idxs_users_train: Sequence[int] = (),
) -> List[int]:
    """Round-0 trains all clients for prompt methods; later rounds sample
    ``max(int(frac·num_users), 1)`` without replacement via the global numpy RNG
    (matching the reference's reliance on the seeded global state)."""
    if idxs_users_train:
        return list(idxs_users_train)
    if all_on_first_round and epoch == 0:
        return list(range(num_users))
    m = max(int(frac * num_users), 1)
    return list(np.random.choice(range(num_users), m, replace=False))
