"""Orbax pytree checkpointing (SURVEY §5: the TPU equivalent of the
reference's torch save/load, torchtools.py:27-166, is Orbax checkpoints of
per-client + global pytrees).

Three formats coexist in the engine:

* flat ``.npz`` grad-only snapshots (``TrainerBase.save_model``) — name-compatible
  with the reference's ``epoch{g}_client{i}`` convention;
* pickle full checkpoints incl. optimizer state (``save_checkpoint``);
* **Orbax** directories (this module) — the production path for large pytrees:
  async-capable, atomic-rename on save, works with sharded jax.Arrays.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_pytree(directory: str, tree: Any, step: Optional[int] = None) -> str:
    """Write a pytree checkpoint with Orbax; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step}") if step is not None else directory
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    return path


def load_pytree(path: str, template: Any = None) -> Any:
    """Restore a pytree checkpoint; with ``template`` restores into matching
    structure/dtypes (needed for sharded restores)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))


def latest_step(directory: str) -> Optional[int]:
    """Highest ``step_N`` subdirectory, or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None
