"""Misc utilities: seeding, dirs, simple ASCII tables.

Mirrors Dassl/dassl/utils/tools.py (set_random_seed, mkdir_if_missing) and
utils/fed_utils.py:103-114 (count_parameters) without the prettytable dep.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def mkdir_if_missing(dirname: str) -> None:
    if dirname and not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)


def ascii_table(headers, rows) -> str:
    """Minimal PrettyTable-style renderer for param-count tables."""
    cols = [list(map(str, col)) for col in zip(headers, *rows)] if rows else [[str(h)] for h in headers]
    widths = [max(len(c) for c in col) for col in cols]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def fmt(row):
        return "| " + " | ".join(str(x).ljust(w) for x, w in zip(row, widths)) + " |"
    lines = [sep, fmt(headers), sep]
    lines += [fmt(r) for r in rows]
    lines.append(sep)
    return "\n".join(lines)


def count_parameters(params: dict, name_filter: str) -> int:
    """Print a table of parameter counts whose path contains ``name_filter``.

    ``params`` is a flat dict of path → array (see core.pytree.flatten_paths).
    Mirrors utils/fed_utils.py:103-114.
    """
    rows = []
    total = 0
    for path, arr in params.items():
        if name_filter in path:
            n = int(np.prod(arr.shape)) if hasattr(arr, "shape") else 1
            rows.append((path, n))
            total += n
    print(ascii_table(["Modules", "Parameters"], rows))
    print(f"Total Trainable Params: {total}")
    return total
