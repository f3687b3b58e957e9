"""Model summary: per-module parameter table (RichModelSummary equivalent).

The reference prints a Lightning RichModelSummary at startup (train.py:120);
this renders the same information from a Flax param/batch-stats pytree.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def _collect(tree, prefix, table, depth, max_depth):
    if depth >= max_depth or not isinstance(tree, dict):
        count = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))
        table[prefix] = table.get(prefix, 0) + count
        return
    for key, value in tree.items():
        _collect(value, f"{prefix}/{key}" if prefix else key, table, depth + 1, max_depth)


def summarize_params(params, max_depth: int = 2) -> str:
    """Render a parameter-count table grouped to ``max_depth`` module levels."""
    table: Dict[str, int] = {}
    _collect(params, "", table, 0, max_depth)
    total = sum(table.values())
    width = max((len(k) for k in table), default=10)
    lines = ["-" * (width + 16)]
    lines += [f"{name:<{width}}  {count:>12,}" for name, count in sorted(table.items())]
    lines.append("-" * (width + 16))
    lines.append(f"{'total':<{width}}  {total:>12,}")
    return "\n".join(lines)
