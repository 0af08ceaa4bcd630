"""Checkpoint I/O.

Parity surface (reference: src/models/__init__.py:11-35): a single-file
checkpoint holding {model, optimizer, lr_scheduler, best_value, config, args},
written only by process 0, gated on best validation metric, restorable in any
subset.  Here the payload is a pickled dict of numpy-ified pytrees (params,
state, opt_state) — host-side, jit-free, and mesh-agnostic: arrays are pulled
to host before writing, and placed by the caller's sharding on load.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_ckpt(path: str, *, params, state=None, opt_state=None,
              lr_step: Optional[int] = None, best_value: float = 0.0,
              config: Optional[dict] = None, args: Optional[dict] = None) -> None:
    """Write a checkpoint; creates parent dirs (reference make_parent_dirs)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state) if state is not None else None,
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "lr_step": lr_step,
        "best_value": best_value,
        "config": config,
        "args": args,
        "format_version": 1,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_ckpt(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def check_if_exists(path: Optional[str]) -> bool:
    return path is not None and os.path.exists(path)
