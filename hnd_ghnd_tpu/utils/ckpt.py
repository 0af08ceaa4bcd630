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


_TREE_KEYS = ("params", "state", "opt_state")
_AUX_FILE = "aux.pkl"


def save_ckpt(path: str, *, params, state=None, opt_state=None,
              lr_step: Optional[int] = None, best_value: float = 0.0,
              config: Optional[dict] = None, args: Optional[dict] = None,
              backend: str = "pickle") -> None:
    """Write a checkpoint; creates parent dirs (reference make_parent_dirs).

    backend='pickle' (default): single-file numpy-pickled payload, written
    atomically — matches the reference's torch.save single-file semantics.
    backend='orbax': directory checkpoint via orbax (sharded, parallel
    array I/O) for very large runs where a single pickled file is
    host-memory bound; aux metadata rides in a sidecar inside the dir.
    A config can select it with ``train.ckpt_backend: orbax``.
    """
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
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _remove_any(path: str) -> None:
    import shutil
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def _save_orbax(path: str, payload: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    trees = {k: payload[k] for k in _TREE_KEYS if payload[k] is not None}
    # Write to a temp sibling, then swap: a crash mid-save must never
    # destroy the previous checkpoint (the pickle backend gets this from
    # tmp + os.replace; directories need a two-rename dance, leaving only
    # a microsecond window between renames).  A pre-existing pickle-backend
    # *file* at `path` is handled the same way.
    tmp = path + ".tmp-orbax"
    _remove_any(tmp)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp, trees)
    aux = {k: v for k, v in payload.items() if k not in _TREE_KEYS}
    aux["tree_keys"] = sorted(trees)
    with open(os.path.join(tmp, _AUX_FILE), "wb") as f:
        pickle.dump(aux, f, protocol=pickle.HIGHEST_PROTOCOL)
    old = path + ".old"
    _remove_any(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    _remove_any(old)


def _recover_old(path: str) -> bool:
    """Promote ``path + '.old'`` back to ``path`` if the swap was cut short.

    The two-rename orbax swap leaves a window where the previous checkpoint
    exists only at ``.old``; callers that find ``path`` missing recover it.
    """
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def load_ckpt(path: str) -> Dict[str, Any]:
    """Load either checkpoint format (auto-detected: dir => orbax)."""
    if not os.path.exists(path):
        _recover_old(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        trees = ckptr.restore(os.path.abspath(path))
        with open(os.path.join(path, _AUX_FILE), "rb") as f:
            payload = pickle.load(f)
        payload.pop("tree_keys", None)
        for k in _TREE_KEYS:
            payload.setdefault(k, None)
        payload.update(trees)
        return payload
    with open(path, "rb") as f:
        return pickle.load(f)


def check_if_exists(path: Optional[str]) -> bool:
    if path is None:
        return False
    if not os.path.exists(path):
        _recover_old(path)
    return os.path.exists(path)
