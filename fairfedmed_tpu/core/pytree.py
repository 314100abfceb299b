"""Parameter-pytree utilities.

The reference moves weights around as torch ``state_dict``s keyed by dotted paths
(e.g. ``prompt_learner.ctx``, ``...mlp.c_fc.lora_S.weight``) and dispatches
aggregation behaviour on key substrings (utils/fed_utils.py:29,77).  Here model
parameters are nested dicts of jax arrays; these helpers provide the dotted-path
view used by federated aggregation, checkpointing and parameter counting.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import numpy as np


def flatten_paths(tree: Any, sep: str = ".") -> dict:
    """Nested dict → flat {dotted/indexed path: leaf} dict."""
    out: dict[str, Any] = {}

    def rec(node, prefix):
        if isinstance(node, Mapping):
            for k in node:
                rec(node[k], f"{prefix}{sep}{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{prefix}{sep}{i}" if prefix else str(i))
        else:
            out[prefix] = node

    rec(tree, "")
    return out


def unflatten_paths(flat: Mapping[str, Any], sep: str = ".") -> dict:
    """Inverse of :func:`flatten_paths` (always rebuilds dicts, never lists)."""
    out: dict = {}
    for path, leaf in flat.items():
        node = out
        parts = path.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return out


def unflatten_like(template: Any, flat: Mapping[str, Any], sep: str = ".") -> Any:
    """Rebuild ``template``'s exact container structure (dicts AND lists —
    e.g. RN block stacks) with leaves taken from the dotted-path dict
    ``flat``, no dtype casting.  :func:`unflatten_paths` alone would turn
    list indices into dict keys and break tree_map against the original."""
    def rec(node, path):
        if isinstance(node, Mapping):
            return {k: rec(v, f"{path}{sep}{k}" if path else str(k))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [rec(v, f"{path}{sep}{i}" if path else str(i))
                   for i, v in enumerate(node)]
            return out if isinstance(node, list) else tuple(out)
        return flat[path]

    return rec(template, "")


def tree_paths(tree: Any, sep: str = ".") -> list:
    return list(flatten_paths(tree, sep=sep))


def map_with_path(fn: Callable[[str, Any], Any], tree: Any, sep: str = ".") -> Any:
    """Like tree_map but ``fn`` receives the dotted path as first argument."""
    flat = flatten_paths(tree, sep=sep)
    return unflatten_paths({k: fn(k, v) for k, v in flat.items()}, sep=sep)


def path_mask(tree: Any, predicate: Callable[[str], bool], sep: str = ".") -> Any:
    """Boolean pytree: True where the dotted path satisfies ``predicate``."""
    return map_with_path(lambda p, _: predicate(p), tree, sep=sep)


def select_by_path(tree: Any, predicate: Callable[[str], bool], sep: str = ".") -> dict:
    """Sub-pytree containing only leaves whose path satisfies ``predicate``."""
    flat = flatten_paths(tree, sep=sep)
    return unflatten_paths({k: v for k, v in flat.items() if predicate(k)}, sep=sep)


def replace_leaves_by_path(tree: Any, flat: Mapping[str, Any],
                           prefix: str = "", sep: str = ".") -> Any:
    """Rebuild ``tree`` with every leaf whose dotted path (+``prefix``) appears
    in ``flat`` replaced by the mapped value (cast to the leaf's dtype).
    Preserves list/dict structure exactly, including empty containers."""
    def rec(node, path):
        if isinstance(node, Mapping):
            return {k: rec(v, f"{path}{sep}{k}" if path else str(k))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [rec(v, f"{path}{sep}{i}" if path else str(i))
                   for i, v in enumerate(node)]
            return out if isinstance(node, list) else tuple(out)
        new = flat.get(path)
        if new is None:
            return node
        import jax.numpy as jnp

        return jnp.asarray(new, node.dtype) if hasattr(node, "dtype") else new

    return rec(tree, prefix)


def merge_trees(base: Any, update: Any) -> Any:
    """Deep merge: leaves in ``update`` override those in ``base``."""
    flat = flatten_paths(base)
    flat.update(flatten_paths(update))
    return unflatten_paths(flat)


def tree_size(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def tree_to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


# ---------------------------------------------------------------------------
# packed host<->device state transfer
# ---------------------------------------------------------------------------
# The federated exchange moves O(100) small arrays per client per round; a
# transfer per leaf costs one host<->device round-trip each (milliseconds on
# a remote-TPU attachment, microseconds locally — either way pure overhead).
# Packing flattens every leaf into ONE fp32 buffer on device, so a state_dict
# pull or push is a single transfer.

@jax.jit
def _pack(*leaves):
    import jax.numpy as jnp

    return jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])


def pack_named_arrays(dev_dict: Mapping[str, Any]):
    """Device dict {name: array} → (np.ndarray flat fp32, meta).

    meta is [(name, shape, dtype, offset, size)] for host-side unpacking."""
    names = list(dev_dict)
    leaves = [dev_dict[k] for k in names]
    flat = np.asarray(_pack(*leaves))  # ONE transfer
    meta, off = [], 0
    for name, leaf in zip(names, leaves):
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        meta.append((name, tuple(leaf.shape), str(leaf.dtype), off, size))
        off += size
    return flat, meta


def unpack_named_arrays(flat, meta) -> dict:
    """Host-side inverse of pack_named_arrays (independent numpy/fp32 copies).

    Copies rather than views: state_dict consumers mutate entries in place
    and must not alias each other (or pin the whole packed buffer)."""
    out = {}
    for name, shape, _dtype, off, size in meta:
        out[name] = np.array(flat[off : off + size], np.float32).reshape(shape)
    return out
