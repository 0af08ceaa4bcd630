"""Parameter-pytree path utilities.

Parity surface: the myutils ``module_util`` functions the reference relies on
(get_module by dotted path, freeze/unfreeze, get_updatable_param_names,
count_params — call sites: src/distillation/tool.py:28-29,
src/mimic_runner.py:132-136, src/cost_analyzer.py:41-49).  Because our param
pytrees are keyed by the same dotted paths, these are dictionary walks.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_by_path(tree: Dict, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def flat_param_names(tree, prefix="") -> List[str]:
    names = []
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            names.extend(flat_param_names(tree[k], f"{prefix}{k}." if prefix or True else k))
    else:
        names.append(prefix[:-1])
    return names


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def trainable_mask(params: Dict, frozen_paths: Sequence[str]) -> Dict:
    """Boolean pytree: False for leaves under any path in ``frozen_paths``
    (the YAML ``frozen_modules`` list), True elsewhere."""
    frozen = [p.split(".") for p in frozen_paths or []]

    def walk(node, path):
        if any(path[:len(f)] == f for f in frozen):
            return jax.tree_util.tree_map(lambda _: False, node)
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return True

    return walk(params, [])


def updatable_param_names(params: Dict, frozen_paths: Sequence[str]) -> List[str]:
    mask = trainable_mask(params, frozen_paths)
    names = []

    def walk(m, path):
        if isinstance(m, dict):
            for k, v in m.items():
                walk(v, f"{path}.{k}" if path else k)
        elif m:
            names.append(path)

    walk(mask, "")
    return sorted(names)


def apply_grad_mask(grads, mask):
    """Zero out gradients of frozen leaves (functional requires_grad=False)."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
