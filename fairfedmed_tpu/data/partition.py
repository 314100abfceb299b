"""Non-IID data partitioners (mirrors utils/datasplit.py:47-480).

All partitioners take label arrays and return per-client index maps for train
and test splits.  Randomness comes from the global numpy RNG (seeded by
``set_random_seed``), like the reference.
"""

from __future__ import annotations

import random
import time
from typing import Dict, Tuple

import numpy as np

# CIFAR-100 fine→coarse label table (utils/datasplit.py:285-296)
CIFAR100_COARSE = np.array([
    4, 1, 14, 8, 0, 6, 7, 7, 18, 3,
    3, 14, 9, 18, 7, 11, 3, 9, 7, 11,
    6, 11, 5, 10, 7, 6, 13, 15, 3, 15,
    0, 11, 1, 10, 12, 14, 16, 9, 11, 5,
    5, 19, 8, 8, 15, 13, 14, 17, 18, 10,
    16, 4, 17, 4, 2, 0, 17, 4, 18, 17,
    10, 3, 2, 12, 12, 16, 12, 1, 9, 19,
    2, 10, 0, 1, 16, 12, 9, 13, 15, 13,
    16, 19, 2, 4, 6, 19, 5, 5, 8, 19,
    18, 1, 2, 15, 6, 0, 17, 8, 14, 13,
])

IndexMap = Dict[int, np.ndarray]


def partition_indices(
    y_train: np.ndarray,
    y_test: np.ndarray,
    partition: str,
    n_parties: int,
    beta: float = 0.4,
    num_classes: int | None = None,
) -> Tuple[IndexMap, IndexMap]:
    """Dispatch on the partition strategy names used by the reference CLI."""
    y_train = np.asarray(y_train)
    y_test = np.asarray(y_test)
    K = num_classes if num_classes is not None else int(max(y_train.max(), y_test.max())) + 1

    if partition == "homo":
        return _homo(y_train, y_test, n_parties)
    if partition == "noniid-labeldir":
        return _label_dirichlet(y_train, y_test, n_parties, beta, K)
    if partition in ("noniid-labeluni", "iid-label100"):
        return _label_uniform(y_train, y_test, n_parties, K)
    if partition.startswith("noniid-#label"):
        k = int(partition[len("noniid-#label"):])
        return _label_quantity(y_train, y_test, n_parties, K, k)
    if partition == "noniid-labeldir100":
        return _hierarchical_dirichlet(y_train, y_test, n_parties, K, beta=beta)
    raise ValueError(f"Unknown partition strategy: {partition}")


def _homo(y_train, y_test, n_parties):
    idxs_train = np.random.permutation(len(y_train))
    idxs_test = np.random.permutation(len(y_test))
    return (
        {i: c for i, c in enumerate(np.array_split(idxs_train, n_parties))},
        {i: c for i, c in enumerate(np.array_split(idxs_test, n_parties))},
    )


def _label_dirichlet(y_train, y_test, n_parties, beta, K, min_require_size=10):
    """Per-class Dirichlet split applied jointly to train+test
    (utils/datasplit.py:298-325): proportions are drawn once per class and
    capped so no client exceeds N/n_parties before renormalisation."""
    N_train = len(y_train)
    min_size = 0
    while min_size < min_require_size:
        idx_batch_train = [[] for _ in range(n_parties)]
        idx_batch_test = [[] for _ in range(n_parties)]
        for k in range(K):
            train_idx_k = np.where(y_train == k)[0]
            test_idx_k = np.where(y_test == k)[0]
            np.random.shuffle(train_idx_k)
            np.random.shuffle(test_idx_k)
            proportions = np.random.dirichlet(np.repeat(beta, n_parties))
            proportions = np.array([
                p * (len(idx_j) < N_train / n_parties)
                for p, idx_j in zip(proportions, idx_batch_train)
            ])
            proportions = proportions / proportions.sum()
            cut_train = (np.cumsum(proportions) * len(train_idx_k)).astype(int)[:-1]
            cut_test = (np.cumsum(proportions) * len(test_idx_k)).astype(int)[:-1]
            idx_batch_train = [a + b.tolist() for a, b in zip(idx_batch_train, np.split(train_idx_k, cut_train))]
            idx_batch_test = [a + b.tolist() for a, b in zip(idx_batch_test, np.split(test_idx_k, cut_test))]
            min_size = min(
                min(len(j) for j in idx_batch_train),
                min(len(j) for j in idx_batch_test),
            )
    out_train, out_test = {}, {}
    for j in range(n_parties):
        np.random.shuffle(idx_batch_train[j])
        np.random.shuffle(idx_batch_test[j])
        out_train[j] = np.asarray(idx_batch_train[j])
        out_test[j] = np.asarray(idx_batch_test[j])
    return out_train, out_test


def _label_uniform(y_train, y_test, n_parties, K):
    """Each class's samples are split evenly across all clients."""
    idx_batch_train = [[] for _ in range(n_parties)]
    idx_batch_test = [[] for _ in range(n_parties)]
    for k in range(K):
        train_idx_k = np.where(y_train == k)[0]
        test_idx_k = np.where(y_test == k)[0]
        np.random.shuffle(train_idx_k)
        np.random.shuffle(test_idx_k)
        for j, chunk in enumerate(np.array_split(train_idx_k, n_parties)):
            idx_batch_train[j].extend(chunk.tolist())
        for j, chunk in enumerate(np.array_split(test_idx_k, n_parties)):
            idx_batch_test[j].extend(chunk.tolist())
    return (
        {j: np.asarray(idx_batch_train[j]) for j in range(n_parties)},
        {j: np.asarray(idx_batch_test[j]) for j in range(n_parties)},
    )


def _label_quantity(y_train, y_test, n_parties, K, k_per_client):
    """noniid-#label{k}: each client holds k classes (utils/datasplit.py)."""
    times = np.zeros(K, dtype=int)
    contain = []
    for i in range(n_parties):
        current = [i % K]
        times[i % K] += 1
        j = 1
        while j < k_per_client:
            ind = random.randint(0, K - 1)
            if ind not in current:
                current.append(ind)
                times[ind] += 1
                j += 1
        contain.append(current)
    out_train = {i: np.array([], dtype=int) for i in range(n_parties)}
    out_test = {i: np.array([], dtype=int) for i in range(n_parties)}
    for cls in range(K):
        if times[cls] == 0:
            continue
        idx_k_train = np.where(y_train == cls)[0]
        idx_k_test = np.where(y_test == cls)[0]
        np.random.shuffle(idx_k_train)
        np.random.shuffle(idx_k_test)
        split_train = np.array_split(idx_k_train, times[cls])
        split_test = np.array_split(idx_k_test, times[cls])
        ids = 0
        for i in range(n_parties):
            if cls in contain[i]:
                out_train[i] = np.append(out_train[i], split_train[ids])
                out_test[i] = np.append(out_test[i], split_test[ids])
                ids += 1
    return out_train, out_test


def _hierarchical_dirichlet(y_train, y_test, n_parties, K, seed=12345,
                            alpha=10, beta=0.4):
    """noniid-labeldir100: pachinko-style coarse→fine Dirichlet allocation over
    the CIFAR-100 hierarchy (utils/datasplit.py:280-430).  The COARSE prior is
    drawn with the CLI ``beta`` (datasplit.py:376) — that is where the label
    skew lives; the fine-within-coarse prior uses the reference's fixed
    alpha=10.  seed=12345 is the reference's fixed internal seed; the split is
    computed over the concatenated train+test pool then re-separated."""
    y = np.concatenate([y_train, y_test], axis=0)
    n_fine = 100
    n_coarse = 20
    rng_seed = seed if seed is not None and seed >= 0 else int(time.time())
    rng = random.Random(rng_seed)
    np.random.seed(rng_seed)

    n_samples = len(y)
    selected = rng.sample(list(range(n_samples)), n_samples)
    n_per_client = n_samples // n_parties

    by_fine = {k: [] for k in range(n_fine)}
    by_coarse = {k: [] for k in range(n_coarse)}
    for idx in selected:
        fine = int(y[idx])
        coarse = int(CIFAR100_COARSE[fine])
        by_fine[fine].append(idx)
        by_coarse[coarse].append(idx)

    fine_by_coarse = {c: [f for f in range(n_fine) if CIFAR100_COARSE[f] == c] for c in range(n_coarse)}
    available_coarse = list(range(n_coarse))
    client_idxs = [[] for _ in range(n_parties)]

    for client in range(n_parties):
        coarse_prior = np.random.dirichlet(alpha=[beta] * len(available_coarse))
        fine_priors = {c: np.random.dirichlet(alpha=[alpha] * len(fine_by_coarse[c]))
                       for c in available_coarse}
        for _ in range(n_per_client):
            probs = np.array([coarse_prior[i] if len(by_coarse[c]) > 0 else 0.0
                              for i, c in enumerate(available_coarse)])
            if probs.sum() == 0:
                break
            probs /= probs.sum()
            ci = np.random.choice(len(available_coarse), p=probs)
            coarse = available_coarse[ci]
            fines = fine_by_coarse[coarse]
            fprobs = np.array([fine_priors[coarse][i] if len(by_fine[f]) > 0 else 0.0
                               for i, f in enumerate(fines)])
            if fprobs.sum() == 0:
                continue
            fprobs /= fprobs.sum()
            fine = fines[np.random.choice(len(fines), p=fprobs)]
            idx = by_fine[fine].pop()
            by_coarse[CIFAR100_COARSE[fine]].remove(idx)
            client_idxs[client].append(idx)

    n_train = len(y_train)
    out_train, out_test = {}, {}
    for j in range(n_parties):
        arr = np.asarray(client_idxs[j])
        out_train[j] = arr[arr < n_train]
        out_test[j] = arr[arr >= n_train] - n_train
    return out_train, out_test


def record_class_counts(y, idx_map: IndexMap) -> dict:
    """Per-client class histograms (reference's traindata_cls_counts)."""
    out = {}
    for client, idxs in idx_map.items():
        vals, counts = np.unique(np.asarray(y)[idxs], return_counts=True)
        out[client] = {int(v): int(c) for v, c in zip(vals, counts)}
    return out
