"""Multi-host (multi-process JAX) coordination helpers.

Parity surface: the reference's NCCL runtime glue (src/utils/main_util.py:
29-62 init_distributed_mode / setup_for_distributed; src/utils/misc_util.py:
72-139 all_gather / reduce_dict, :236-262 is_main_process / save_on_master).

In single-controller JAX most of that machinery evaporates: gradient/metric
reduction happens inside compiled programs, and a single process drives one
or many chips.  What remains meaningful multi-host (multi-process SPMD over
DCN) is: process identity, barrier, replicated-value agreement, and
gathering host-local python objects (eval predictions) to process 0 — all
provided here, with single-process fast paths exactly like the reference's
world_size==1 shortcuts.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX (the init_process_group analog).

    Returns True when running distributed.  With no arguments this is the
    reference's env-driven behavior: single process unless coordination env
    is provided.
    """
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def setup_for_distributed(is_master: bool) -> None:
    """Suppress print on non-master processes (the reference monkey-patches
    builtins.print the same way, src/utils/main_util.py:29-40); ``force=True``
    overrides."""
    import builtins
    orig_print = builtins.print

    def print_(*args, force: bool = False, **kwargs):
        if is_master or force:
            orig_print(*args, **kwargs)

    builtins.print = print_


def maybe_init_distributed(args: Optional[Any] = None) -> bool:
    """Env/args-driven multi-process init (the reference's
    init_distributed_mode, main_util.py:43-62: RANK/WORLD_SIZE env vars or a
    graceful single-process fallback).  Recognized sources, in order: CLI
    flags (--coordinator_address/--num_processes/--process_id), then the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    Returns True when running multi-process."""
    import os

    def pick(attr, env):
        v = getattr(args, attr, None) if args is not None else None
        return v if v is not None else os.environ.get(env)

    coord = pick("coordinator_address", "JAX_COORDINATOR_ADDRESS")
    nproc = pick("num_processes", "JAX_NUM_PROCESSES")
    pid = pick("process_id", "JAX_PROCESS_ID")
    if coord is None or nproc is None or pid is None:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc),
                               process_id=int(pid))
    setup_for_distributed(jax.process_index() == 0)
    return jax.process_count() > 1


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def save_on_master(save_fn, *args, **kwargs) -> None:
    """Run a checkpoint write only on process 0 (misc_util.py:260-262)."""
    if is_main_process():
        save_fn(*args, **kwargs)


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every process (the reference's
    padded-byte-tensor all_gather, misc_util.py:72-112) — used to merge
    per-host evaluator state."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(gathered.shape[0])]


def reduce_scalars(values: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Cross-process scalar reduction for logging (reduce_dict analog,
    misc_util.py:115-139).  Inside compiled train steps reductions are
    already global; this is for host-side counters."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils
    keys = sorted(values.keys())
    arr = np.asarray([values[k] for k in keys], np.float64)
    total = multihost_utils.process_allgather(arr).sum(axis=0)
    if average:
        total = total / jax.process_count()
    return dict(zip(keys, total.tolist()))
