"""Supervised detection train step attribution on TPU (coco_runner path).

The distill step (bench.py) is the headline, but the reference's org
configs — how teachers are produced — run the full supervised step:
backbone fwd/bwd + RPN losses + RoI box-loss with 512 sampled proposals
per image pooled through RoIAlign (torchvision RoIHeads semantics).
This tool measures that step at real resolution and isolates the
train-path pooling cost to size the pallas-forward/linear-transpose-
backward lever.

Usage: python tools/train_bench.py [--batch 16] [--hw 832,1344]
Prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_steps(step_fn, state, args, iters):
    """state-carrying chained timing, one final scalar read."""
    cur = state
    out = step_fn(*cur, *args)
    float(out[0])  # compile + warm
    cur = out[2:]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*cur, *args)
        cur = out[2:]
    float(out[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="832,1344")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))
    b = args.batch

    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                            make_detection_train_step)
    import __graft_entry__ as ge

    model = build_model(ge._teacher_config())
    params, state = model.init(jax.random.PRNGKey(0))
    opt, _ = build_optimizer({"type": "SGD", "params": {
        "lr": 0.0075, "momentum": 0.9, "weight_decay": 1e-4}})
    step = make_detection_train_step(model, opt, (),
                                     compute_dtype=jnp.bfloat16)
    opt_state = opt.init(params)

    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (b, h, w, 3), jnp.bfloat16)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)
    batch = {"images": images, "image_sizes": sizes,
             "original_sizes": sizes}
    # plausible GT: 8 random boxes per image
    g = 8
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, (b, g, 1), minval=0, maxval=900)
    y1 = jax.random.uniform(k2, (b, g, 1), minval=0, maxval=500)
    wh = jax.random.uniform(k1, (b, g, 2), minval=30, maxval=280)
    boxes = jnp.concatenate([x1, y1, x1 + wh[..., :1], y1 + wh[..., 1:]], -1)
    targets = {"boxes": boxes,
               "labels": jnp.ones((b, g), jnp.int32),
               "boxes_valid": jnp.ones((b, g), bool)}
    rng = jax.random.PRNGKey(3)

    def step_fn(params, state, opt_state):
        loss, loss_dict, p2, s2, o2 = step(params, state, opt_state,
                                           batch, targets, rng)
        return loss, loss_dict, p2, s2, o2

    wrapped = jax.jit(lambda p, s, o: step_fn(p, s, o))
    t_step = chained_steps(wrapped, (params, state, opt_state), (),
                           args.iters)
    print(json.dumps({"stage": "detection_train_step",
                      "ms": round(t_step * 1000, 1),
                      "img_s": round(b / t_step, 2)}), flush=True)

    # ------------------------------------------------- train-pool isolation
    # the box branch pools 512 sampled proposals per image at 7x7; measure
    # that pooling (fwd) and its VJP (bwd scatter) at the same scale
    from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align_batch
    from hnd_ghnd_tpu.ops.pallas_roi import pallas_multiscale_roi_align_batch

    # FPN features at this bucket (bf16, like the step's); 5 levels incl.
    # the stride-64 pool level the RPN consumes — pooling uses feats[:4]
    feats = []
    for st in (4, 8, 16, 32, 64):
        feats.append(jax.random.normal(
            key, (b, h // st, w // st, 256), jnp.bfloat16))
    r = 512
    props = jax.random.uniform(k2, (b, r, 4), minval=0, maxval=700)
    props = jnp.concatenate(
        [props[..., :2], props[..., :2] + 16 + props[..., 2:]], -1)

    def chain_pool(fn, name):
        @jax.jit
        def chained(feats, props):
            s = jnp.float32(0.0)
            for _ in range(args.iters):
                eps = (s * jnp.float32(1e-30)).astype(props.dtype)
                out = fn(feats, props + eps)
                s = s + jnp.mean(out).astype(jnp.float32)
            return s
        float(chained(feats, props))
        t0 = time.perf_counter()
        float(chained(feats, props))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"stage": name, "ms": round(dt * 1000, 2)}),
              flush=True)
        return dt

    def xla_pool(f, p):
        return multiscale_roi_align_batch(f[:4], p, (h, w), 7)

    def pallas_pool(f, p):
        return pallas_multiscale_roi_align_batch(f[:4], p, (h, w), 7)

    chain_pool(xla_pool, "train_pool_fwd_xla")
    chain_pool(pallas_pool, "train_pool_fwd_pallas")

    # backward: vjp wrt features of the XLA pooling (the scatter the train
    # step pays inside grad)
    def pool_loss(f):
        return jnp.sum(multiscale_roi_align_batch(
            f[:4], props, (h, w), 7).astype(jnp.float32))

    @jax.jit
    def chained_grad(feats):
        s = jnp.float32(0.0)
        for _ in range(args.iters):
            f2 = [x + (s * jnp.float32(1e-30)).astype(x.dtype) for x in feats]
            g = jax.grad(pool_loss)(f2)
            s = s + jnp.mean(g[0]).astype(jnp.float32)
        return s

    float(chained_grad(feats))
    t0 = time.perf_counter()
    float(chained_grad(feats))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"stage": "train_pool_fwd_plus_bwd_xla",
                      "ms": round(dt * 1000, 2)}), flush=True)

    # -------------------------------------------------- coarse stage split
    # forward-only loss (no grad): separates the fwd pipeline (backbone +
    # RPN propose/NMS + matcher/sampler + pooled heads) from the backward
    def loss_only(params, state):
        losses, _, _ = model.forward(params, state, batch, training=True,
                                     targets=targets, rng=rng)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    @jax.jit
    def chained_loss(params, state):
        s = jnp.float32(0.0)
        for _ in range(args.iters):
            p2 = jax.tree_util.tree_map(
                lambda x: x + (s * jnp.float32(1e-30)).astype(x.dtype)
                if x.dtype in (jnp.float32, jnp.bfloat16) else x, params)
            s = s + loss_only(p2, state)
        return s

    float(chained_loss(params, state))
    t0 = time.perf_counter()
    float(chained_loss(params, state))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"stage": "train_loss_forward_only",
                      "ms": round(dt * 1000, 2)}), flush=True)

    # train-time RPN propose (2000-proposal NMS per level at train sizes)
    def rpn_train(feats):
        proposals, prop_valid, _ = model.rpn.propose(
            params["rpn"], feats, sizes, (h, w), training=True)
        return proposals

    @jax.jit
    def chained_rpn(feats):
        s = jnp.float32(0.0)
        for _ in range(args.iters):
            f2 = [x + (s * jnp.float32(1e-30)).astype(x.dtype)
                  for x in feats]
            out = rpn_train(f2)
            s = s + jnp.mean(out).astype(jnp.float32)
        return s

    float(chained_rpn(feats))
    t0 = time.perf_counter()
    float(chained_rpn(feats))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"stage": "rpn_propose_train",
                      "ms": round(dt * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()
