from .mesh import CLIENT_AXIS, DATA_AXIS, batch_sharding, build_mesh, client_sharding, replicated
from .precision import Policy, policy_from_prec
from .pytree import (
    flatten_paths,
    map_with_path,
    merge_trees,
    path_mask,
    select_by_path,
    tree_paths,
    tree_size,
    tree_to_numpy,
    unflatten_paths,
)

__all__ = [
    "CLIENT_AXIS",
    "DATA_AXIS",
    "build_mesh",
    "client_sharding",
    "batch_sharding",
    "replicated",
    "Policy",
    "policy_from_prec",
    "flatten_paths",
    "unflatten_paths",
    "tree_paths",
    "map_with_path",
    "path_mask",
    "select_by_path",
    "merge_trees",
    "tree_size",
    "tree_to_numpy",
]
