"""Device mesh, shardings, and compiled train steps.

The reference's distributed runtime is NCCL DDP: one OS process per GPU,
DistributedSampler, implicit gradient all-reduce in backward, pickle-based
eval all_gather (src/utils/main_util.py:43-62, src/utils/misc_util.py:72-139).
The TPU-native replacement is a single-controller SPMD design:

  * one ``jax.sharding.Mesh`` with a ``data`` axis spanning every chip
    (extendable to multi-host: the same code runs under multi-process JAX
    with per-host data feeding);
  * the train step is one jitted program: batch sharded on ``data``, params
    and optimizer state replicated; XLA inserts the gradient all-reduce over
    ICI automatically from the sharding annotations — the DDP analog with
    compiler-scheduled overlap;
  * metric "sync" is free — loss scalars are already global reductions.

bf16 policy: matmul/conv inputs bfloat16 (the MXU accumulates bf16 operands
in fp32 internally), parameters and optimizer state fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hnd_ghnd_tpu.distill.box import DistillationBox
from hnd_ghnd_tpu.utils.params import apply_grad_mask, trainable_mask

Params = Dict[str, Any]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence[jax.Device]] = None,
                        axis_name: str = "data") -> Mesh:
    """Largest device count that divides the global batch (a 4-image batch on
    an 8-device host uses 4 devices; DDP would just crash)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n], axis_name)


def shard_batch_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh,
              batch_dim: int = 0) -> Dict[str, jnp.ndarray]:
    """Shard a batch onto the mesh's data axis.

    Single-process: a plain sharded device_put.  Multi-process (mesh spans
    processes): each process holds only its local shard of the global batch
    (per-host sharded loading, the DistributedSampler analog) and the global
    array is assembled from process-local data — the standard multi-host
    input recipe.

    ``batch_dim``: which dimension carries the batch.  Stacked microbatch
    dispatches (``tpu.steps_per_dispatch`` > 1) carry leaves shaped
    ``[n_steps, B, ...]`` and shard dim 1."""
    axes = [None] * batch_dim + [mesh.axis_names[0]]
    spec = NamedSharding(mesh, P(*axes))
    if jax.process_count() > 1 and any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat):
        return {k: jax.make_array_from_process_local_data(spec, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, spec) for k, v in batch.items()}


def stack_microbatches(batches: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack N loader batches into one ``[N, ...]``-leaved dispatch payload.

    Host numpy leaves stack on host (one contiguous H2D staging buffer);
    already-on-device leaves stack on device (no device->host hop)."""
    out = {}
    for k in batches[0]:
        vals = [b[k] for b in batches]
        if all(isinstance(v, np.ndarray) for v in vals):
            out[k] = np.stack(vals)
        else:
            out[k] = jnp.stack([jnp.asarray(v) for v in vals])
    return out


def replicate(tree, mesh: Mesh):
    spec = replicate_spec(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)


# ---------------------------------------------------------------------------
# Optimizer (reference train.optimizer/scheduler YAML schema)
# ---------------------------------------------------------------------------

def build_schedule(base_lr: float, scheduler_cfg: Optional[dict],
                   steps_per_epoch: int, warmup_iters: int = 0,
                   warmup_factor: float = 1.0 / 1000.0):
    """MultiStepLR (epoch milestones -> step boundaries) + the reference's
    linear warmup over the first min(1000, len(loader)-1) iterations of
    epoch 0 (src/utils/main_util.py:65-72, src/mimic_runner.py:42-46)."""
    boundaries = {}
    if scheduler_cfg and scheduler_cfg.get("type") == "MultiStepLR":
        gamma = float(scheduler_cfg["params"].get("gamma", 0.1))
        scale = 1.0
        for ms in scheduler_cfg["params"]["milestones"]:
            scale *= gamma
            boundaries[int(ms) * steps_per_epoch] = scale
    elif scheduler_cfg and scheduler_cfg.get("type") not in (None, "MultiStepLR"):
        raise ValueError(f"unsupported scheduler `{scheduler_cfg.get('type')}`")

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for boundary, scale in sorted(boundaries.items()):
            lr = jnp.where(step >= boundary, base_lr * scale, lr)
        if warmup_iters > 0:
            alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            wf = warmup_factor * (1 - alpha) + alpha
            lr = lr * jnp.where(step < warmup_iters, wf, 1.0)
        return lr

    return schedule


def build_optimizer(optimizer_cfg: dict, scheduler_cfg: Optional[dict] = None,
                    steps_per_epoch: int = 1, warmup_iters: int = 0):
    """torch.optim.<type>(**params) analog via optax.

    Supported (the reference configs use exactly these): Adam(lr) and
    SGD(lr, momentum, weight_decay).
    """
    otype = optimizer_cfg["type"]
    p = dict(optimizer_cfg.get("params", {}))
    lr = float(p.pop("lr"))
    schedule = build_schedule(lr, scheduler_cfg, steps_per_epoch, warmup_iters)
    if otype == "Adam":
        return optax.adam(schedule, **{k: v for k, v in p.items() if k != "lr"}), schedule
    if otype == "SGD":
        momentum = float(p.pop("momentum", 0.0))
        wd = float(p.pop("weight_decay", 0.0))
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.sgd(schedule, momentum=momentum or None))
        return optax.chain(*chain), schedule
    raise ValueError(f"unsupported optimizer `{otype}`")


# ---------------------------------------------------------------------------
# Compiled train steps
# ---------------------------------------------------------------------------

def images_to_compute(images: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Jit-boundary pixel cast.  uint8-wire batches (loader
    ``pixel_dtype="uint8"``: 4x less host/H2D traffic) carry rounded codes
    and are dequantized here with a *1/255 that XLA fuses into the
    normalize; float batches are already in [0, 1]."""
    if images.dtype == jnp.uint8:
        return images.astype(compute_dtype) * jnp.asarray(
            1.0 / 255.0, compute_dtype)
    return images.astype(compute_dtype)


def make_distill_train_step(box: DistillationBox, optimizer,
                            frozen_modules: Sequence[str],
                            mesh: Optional[Mesh] = None,
                            compute_dtype=jnp.bfloat16,
                            donate: bool = True,
                            steps_per_dispatch: int = 1,
                            dispatch_unroll: int = 1):
    """Build the jitted HND/GHND step.

    When ``criterion.org_loss_factor == 0`` (all 27 shipped reference
    configs):

      step(t_params, t_state, s_params, s_state, opt_state, batch, rng)
        -> (loss, loss_dict, new_s_params, new_s_state, new_opt_state)

    Gradient sync across the mesh's data axis is implicit: the loss is a
    global sum over the sharded batch, so XLA emits the psum. Frozen modules
    (YAML ``frozen_modules``) get zero gradients — requires_grad=False in
    functional form.

    When ``org_loss_factor != 0`` the reference's criterion adds
    ``factor × Σ task losses`` from a full student forward with targets
    (src/distillation/loss.py:31-34; tool.py:49-58 feeds the targets), so
    the step takes one extra positional argument:

      step(t_params, t_state, s_params, s_state, opt_state, batch,
           targets, rng)

    On a >1-device mesh that variant runs under ``shard_map`` with
    reference-DDP semantics (per-shard losses, ``fold_in(rng, shard)``
    proposal sampling, pmean-averaged gradients) exactly like
    :func:`make_detection_train_step` — the student's training forward
    pools RoIs through a ``pallas_call`` that GSPMD cannot partition.

    ``steps_per_dispatch`` > 1 builds the same step as a ``lax.scan`` over N
    stacked microbatches (leaves ``[N, B, ...]``, rng keys ``[N, 2]``): one
    host dispatch runs N optimizer steps back-to-back on device, amortizing
    per-dispatch host overhead (~28 ms/dispatch on a tunneled backend,
    sub-ms on directly attached hosts — BASELINE.md round-5).  The update
    sequence equals N single dispatches with the same keys in exact
    arithmetic (same math, same rng); the scanned and plain steps are
    separately-compiled XLA programs, so large reductions may reassociate
    at fp-noise level (parity tested at 1e-6 rel under SGD,
    tests/test_distill.py::TestStackedDispatch).  The step returns stacked
    ``[N]`` losses/term scalars for per-microstep logging.

    ``dispatch_unroll``: ``lax.scan`` unroll factor for the microstep loop.
    A scan body is compiled once and iterated behind a loop barrier; XLA
    can overlap/fuse across unrolled copies but not across loop trips.
    Compile-size bound: grad programs with RoI gather/scatter crash the
    remote compile helper above ~2 unrolled copies (BASELINE.md round-5).
    """
    use_org = box.use_org_loss
    spd = max(int(steps_per_dispatch), 1)
    unroll = max(int(dispatch_unroll), 1)

    def local_step(t_params, t_state, s_params, s_state, opt_state, batch,
                   targets, rng, axis: Optional[str]):
        mask = trainable_mask(s_params, frozen_modules)
        images = images_to_compute(batch["images"], compute_dtype)
        cast_batch = dict(batch, images=images)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(sp):
            total, (loss_dict, new_s_state) = box.loss(
                t_params, t_state, sp, s_state, cast_batch,
                targets=targets, rng=rng)
            return total, (loss_dict, new_s_state)

        (loss, (loss_dict, new_s_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s_params)
        if axis is not None:
            pmean = functools.partial(jax.lax.pmean, axis_name=axis)
            loss, loss_dict, grads = jax.tree_util.tree_map(
                pmean, (loss, loss_dict, grads))
            new_s_state = jax.tree_util.tree_map(
                lambda x: pmean(x) if jnp.issubdtype(x.dtype, jnp.inexact)
                else x, new_s_state)
        grads = apply_grad_mask(grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, s_params)
        new_s_params = optax.apply_updates(s_params, updates)
        return loss, loss_dict, new_s_params, new_s_state, new_opt_state

    def scanned(t_params, t_state, s_params, s_state, opt_state, batch,
                targets, rng, axis: Optional[str]):
        # batch/targets leaves [N, B, ...]; rng [N]-stacked keys
        def body(carry, xs):
            sp, ss, os_ = carry
            if use_org:
                b, tg, key = xs
            else:
                b, key = xs
                tg = None
            loss, loss_dict, sp, ss, os_ = local_step(
                t_params, t_state, sp, ss, os_, b, tg, key, axis)
            return (sp, ss, os_), (loss, loss_dict)

        xs = (batch, targets, rng) if use_org else (batch, rng)
        (sp, ss, os_), (losses, loss_dicts) = jax.lax.scan(
            body, (s_params, s_state, opt_state), xs, unroll=unroll)
        return losses, loss_dicts, sp, ss, os_

    core = scanned if spd > 1 else local_step
    if use_org:
        def step(t_params, t_state, s_params, s_state, opt_state, batch,
                 targets, rng):
            return core(t_params, t_state, s_params, s_state,
                        opt_state, batch, targets, rng, None)
    else:
        def step(t_params, t_state, s_params, s_state, opt_state, batch,
                 rng):
            return core(t_params, t_state, s_params, s_state,
                        opt_state, batch, None, rng, None)

    donate_args = (2, 3, 4) if donate else ()
    if mesh is None or mesh.size <= 1:
        return jax.jit(step, donate_argnums=donate_args)

    # stacked dispatches carry the batch dim at position 1
    batch_spec = P(None, "data") if spd > 1 else P("data")
    if use_org:
        axis = mesh.axis_names[0]
        sharded = jax.shard_map(
            functools.partial(core, axis=axis),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), batch_spec, batch_spec, P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False)  # pallas_call has no vma rule; pmean replicates
        return jax.jit(sharded, donate_argnums=donate_args)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, batch_spec)
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, repl,
                      {"images": data, "image_sizes": data,
                       "original_sizes": data}, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=donate_args,
    )


def make_detection_train_step(model, optimizer,
                              frozen_modules: Sequence[str] = (),
                              mesh: Optional[Mesh] = None,
                              compute_dtype=jnp.bfloat16,
                              steps_per_dispatch: int = 1,
                              dispatch_unroll: int = 1):
    """Supervised detector training step (the coco_runner path): loss = sum
    of the R-CNN loss dict (reference src/coco_runner.py:43-44).

    Single device: one jitted step.  On a >1-device mesh the step runs
    under ``jax.shard_map`` with reference-DDP semantics — each shard
    computes its local loss (normalized over its OWN sampled proposals,
    exactly what each DDP rank does) and gradients are ``pmean``-averaged
    across the data axis (torch DDP's allreduce-average;
    /root/reference/src/coco_runner.py trains under
    DistributedDataParallel).  shard_map rather than GSPMD because the
    train-path RoI pooling is a ``pallas_call`` (ops/pallas_roi.py), which
    GSPMD cannot partition but manual per-shard SPMD runs unchanged — the
    same reason sharded EVAL uses shard_map (runners/common.py).  The
    sampler rng is ``fold_in``-ed with the shard index so shards draw
    independent proposal samples (each DDP rank samples its own images).

    ``steps_per_dispatch`` > 1: scan over N stacked microbatches per host
    dispatch (see :func:`make_distill_train_step`); targets stack cleanly
    because the loader pads them to a static MAX_GT.  ``dispatch_unroll``:
    scan unroll factor (see :func:`make_distill_train_step`).
    """
    spd = max(int(steps_per_dispatch), 1)
    unroll = max(int(dispatch_unroll), 1)

    def local_step(params, state, opt_state, batch, targets, rng,
                   axis: Optional[str]):
        mask = trainable_mask(params, frozen_modules)
        images = images_to_compute(batch["images"], compute_dtype)
        cast_batch = dict(batch, images=images)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(p):
            losses, new_state, _ = model.forward(
                p, state, cast_batch, training=True, targets=targets, rng=rng)
            total = sum(losses.values())
            return total, (losses, new_state)

        (loss, (loss_dict, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if axis is not None:
            pmean = functools.partial(jax.lax.pmean, axis_name=axis)
            loss, loss_dict, grads = jax.tree_util.tree_map(
                pmean, (loss, loss_dict, grads))
            new_state = jax.tree_util.tree_map(
                lambda x: pmean(x) if jnp.issubdtype(x.dtype, jnp.inexact)
                else x, new_state)
        grads = apply_grad_mask(grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss, loss_dict, new_params, new_state, new_opt_state

    def scanned(params, state, opt_state, batch, targets, rng,
                axis: Optional[str]):
        def body(carry, xs):
            p, s, o = carry
            b, tg, key = xs
            loss, loss_dict, p, s, o = local_step(p, s, o, b, tg, key, axis)
            return (p, s, o), (loss, loss_dict)

        (p, s, o), (losses, loss_dicts) = jax.lax.scan(
            body, (params, state, opt_state), (batch, targets, rng),
            unroll=unroll)
        return losses, loss_dicts, p, s, o

    core = scanned if spd > 1 else local_step
    if mesh is None or mesh.size <= 1:
        step = functools.partial(core, axis=None)
        return jax.jit(step, donate_argnums=(0, 1, 2))

    axis = mesh.axis_names[0]
    batch_spec = P(None, axis) if spd > 1 else P(axis)
    sharded = jax.shard_map(
        functools.partial(core, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec, batch_spec, P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)  # pallas_call has no vma rule; pmean replicates
    return jax.jit(sharded, donate_argnums=(0, 1, 2))
