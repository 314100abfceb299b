"""Pairwise distance matrices (Dassl metrics API).

Reference: ``Dassl/dassl/metrics/distance.py:1-77`` — exported by the Dassl
metrics package (unused by the FL path, kept for API completeness).  The torch
``pow/expand/addmm_`` chain is replaced by a single broadcast + matmul each,
which XLA fuses into one kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_distance_matrix(input1, input2, metric: str = "euclidean"):
    """Distance matrix between two 2-D feature matrices.

    Args:
        input1: ``[m, d]`` feature matrix.
        input2: ``[n, d]`` feature matrix.
        metric: ``"euclidean"`` (squared) or ``"cosine"``.

    Returns:
        ``[m, n]`` distance matrix.
    """
    input1, input2 = jnp.asarray(input1), jnp.asarray(input2)
    if input1.ndim != 2:
        raise ValueError(f"Expected 2-D tensor, but got {input1.ndim}-D")
    if input2.ndim != 2:
        raise ValueError(f"Expected 2-D tensor, but got {input2.ndim}-D")
    if input1.shape[1] != input2.shape[1]:
        raise ValueError(
            f"feature dims differ: {input1.shape[1]} vs {input2.shape[1]}")
    if metric == "euclidean":
        return euclidean_squared_distance(input1, input2)
    if metric == "cosine":
        return cosine_distance(input1, input2)
    raise ValueError(
        f"Unknown distance metric: {metric}. "
        'Please choose either "euclidean" or "cosine"')


def euclidean_squared_distance(input1, input2):
    """``‖x_i − y_j‖²`` via the expanded form ``‖x‖² + ‖y‖² − 2·x·yᵀ``
    (Dassl/dassl/metrics/distance.py:46-62)."""
    input1, input2 = jnp.asarray(input1), jnp.asarray(input2)
    sq1 = (input1 ** 2).sum(axis=1, keepdims=True)          # [m, 1]
    sq2 = (input2 ** 2).sum(axis=1, keepdims=True).T        # [1, n]
    return sq1 + sq2 - 2.0 * input1 @ input2.T


def cosine_distance(input1, input2):
    """``1 − cos(x_i, y_j)`` with torch's ``F.normalize`` eps semantics
    (Dassl/dassl/metrics/distance.py:65-77)."""
    input1, input2 = jnp.asarray(input1), jnp.asarray(input2)
    eps = 1e-12  # F.normalize clamps the norm, not the vector
    n1 = input1 / jnp.maximum(
        jnp.linalg.norm(input1, axis=1, keepdims=True), eps)
    n2 = input2 / jnp.maximum(
        jnp.linalg.norm(input2, axis=1, keepdims=True), eps)
    return 1.0 - n1 @ n2.T
