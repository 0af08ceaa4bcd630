"""Supervised train-step BACKWARD attribution (VERDICT r4 next #1).

Round 4 measured the coco_runner step at 617 ms (batch 16, 832x1344,
bf16): 128 ms loss-forward, ~489 ms backward+optimizer, of which only the
pool backward (~46 ms) was attributed.  This tool isolates the backward
the same way round 3 attributed the eval forward: chained timing of
value_and_grad over TRUNCATED losses, so each stage's fwd+bwd cost is
measured directly and the deltas attribute the backward:

  grad_backbone            backbone+FPN fwd+bwd (loss = sum of FPN means)
  grad_rpn  - grad_backbone  RPN head fwd+bwd + RPN loss machinery
  grad_roi  - grad_backbone  pool fwd+bwd + box head fwd+bwd + sampling
  grad_full - (above)        interaction / residual
  step - grad_full           optimizer + grad-mask + param update

Levers (each a full-step variant): jax.checkpoint around the backbone
(recompute the trunk in the backward; trades ~1 trunk fwd for the multi-GB
activation footprint), donation on/off, and a batch sweep (--batch) whose
per-image cost curve is the memory-pressure signature.

Reference path being accelerated: /root/reference/src/coco_runner.py:29-63
(torchvision anchor ~5.4 img/s at batch 2/V100).

Usage: python tools/bwd_bench.py [--stages step,grad,...] [--batch 16]
Prints one JSON line per measurement.  TPU-tunnel discipline: data is
generated on device, every variant chains iterations through a scalar
data dependency, and exactly one float() host read closes each timing.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ALL_STAGES = ("dispatch", "step", "step_nodonate", "grad", "opt", "fwd",
              "fwd_unrolled", "fwd_both", "fwd_backbone", "grad_backbone",
              "grad_rpn", "grad_roi", "grad_unrolled",
              "grad_backbone_unrolled", "grad_rpn_unrolled",
              "grad_roi_unrolled", "step_unrolled", "distill_unrolled",
              "xcost", "remat")


def tree_scalar(tree):
    """Reduce EVERY inexact leaf into one f32 scalar (prevents XLA DCE of
    any gradient branch — the round-4 eval_bench lesson)."""
    leaves = [jnp.mean(l).astype(jnp.float32)
              for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)]
    return sum(leaves, jnp.float32(0.0))


def perturb(tree, s):
    """Add s*1e-30 to every float leaf in the leaf dtype (chains iterations
    without promoting the program — the round-4 erratum)."""
    eps = s * jnp.float32(1e-30)
    return jax.tree_util.tree_map(
        lambda x: x + eps.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.inexact) else x, tree)


def chain_scalar(fn, iters, *args):
    """fn(s, *args) -> f32 scalar; python-loop chained via the scalar,
    one final host read."""
    s = fn(jnp.float32(0.0), *args)
    float(s)  # compile + warm
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    return (time.perf_counter() - t0) / iters


def emit(stage, dt, extra=None):
    rec = {"stage": stage, "ms": round(dt * 1000, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="832,1344")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", default=",".join(ALL_STAGES))
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    h, w = (int(v) for v in args.hw.split(","))
    b = args.batch

    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, trainable_mask,
                                            apply_grad_mask,
                                            make_detection_train_step)
    from hnd_ghnd_tpu.runners import common
    import optax
    import __graft_entry__ as ge

    common.enable_persistent_compilation_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    model = build_model(ge._teacher_config())
    params, state = model.init(jax.random.PRNGKey(0))
    opt, _ = build_optimizer({"type": "SGD", "params": {
        "lr": 0.0075, "momentum": 0.9, "weight_decay": 1e-4}})
    opt_state = opt.init(params)

    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (b, h, w, 3), jnp.bfloat16)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)
    batch = {"images": images, "image_sizes": sizes, "original_sizes": sizes}
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
    image_shape = (h, w)

    # ----- training-branch pieces (mirrors RCNN.forward's training arm so
    # losses can be truncated per stage; rcnn.py:152-174)
    def backbone_fpn(p, s_, imgs):
        _, fpn_feats, _, _ = model.backbone_features(p, s_, imgs,
                                                     training=True)
        return fpn_feats

    def split_rngs():
        return jax.random.split(rng)

    def rpn_and_roi_losses(p, fpn_feats, parts):
        rpn_rng, roi_rng = split_rngs()
        out = {}
        proposals, prop_valid, raw = model.rpn.propose(
            p["rpn"], fpn_feats, sizes, image_shape, training=True)
        if "rpn" in parts:
            out.update(model.rpn.loss(raw, targets, rpn_rng))
        if "roi" in parts:
            sampled = model.roi_heads.select_training_samples(
                proposals, prop_valid, targets, roi_rng)
            out.update(model.roi_heads.loss(p["roi_heads"], fpn_feats,
                                            image_shape, sampled))
        return out

    def truncated_loss(p, parts, ckpt=False):
        bf = jax.checkpoint(backbone_fpn) if ckpt else backbone_fpn
        fpn_feats = bf(p, state, images)
        if parts == ("backbone",):
            return tree_scalar(fpn_feats)
        losses = rpn_and_roi_losses(p, fpn_feats, parts)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    def grad_stage(name, parts, ckpt=False, donate=False):
        """donate=True feeds the (perturbed) params back through the chain
        with the input donated — the same aliasing the real train step gets,
        needed for the RoI-branch grads whose program temps alone are
        ~15 GB (xcost_grad)."""
        if donate:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def gfn_d(s, p):
                p2 = perturb(p, s)
                loss_and = jax.value_and_grad(
                    lambda q: truncated_loss(q, parts, ckpt))(p2)
                return tree_scalar(loss_and[1]) + loss_and[0], p2

            p_c, _ = model.init(jax.random.PRNGKey(0))
            s = jnp.float32(0.0)
            s, p_c = gfn_d(s, p_c)
            float(s)  # compile + warm
            s = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, p_c = gfn_d(s, p_c)
            float(s)
            dt = (time.perf_counter() - t0) / args.iters
        else:
            @jax.jit
            def gfn(s, p):
                gr = jax.grad(lambda q: truncated_loss(q, parts, ckpt))(
                    perturb(p, s))
                return tree_scalar(gr)
            dt = chain_scalar(gfn, args.iters, params)
        emit(name, dt)
        return dt

    def grad_stage_unrolled(name, parts, iters=None):
        """In-jit unrolled grad chain — the round-4 methodology, free of the
        per-dispatch tunnel overhead the python-loop chains carry (measured
        ~106 ms/call on this backend for the loss-forward program)."""
        it = iters or args.iters

        @jax.jit
        def g(p):
            s = jnp.float32(0.0)
            for _ in range(it):
                loss, gr = jax.value_and_grad(
                    lambda q: truncated_loss(q, parts))(perturb(p, s))
                s = s + tree_scalar(gr) + loss
            return s

        float(g(params))
        t0 = time.perf_counter()
        float(g(params))
        emit(name, (time.perf_counter() - t0) / it)

    # ------------------------------------------------------------- dispatch
    if "dispatch" in stages:
        @jax.jit
        def tiny(s):
            return s + jnp.float32(1.0)
        emit("dispatch_floor", chain_scalar(tiny, args.iters))

    # ------------------------------------------------------------ full step
    def run_full_step(name, donate, remat=False):
        if remat:
            def local_step(p, s_, o, bt, tg, r):
                mask = trainable_mask(p, ())
                def loss_fn(q):
                    fpn_feats = jax.checkpoint(backbone_fpn)(
                        q, s_, bt["images"])
                    losses = rpn_and_roi_losses(q, fpn_feats, ("rpn", "roi"))
                    return sum(losses.values()), losses
                (loss, ld), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                grads = apply_grad_mask(grads, mask)
                updates, o2 = opt.update(grads, o, p)
                p2 = optax.apply_updates(p, updates)
                return loss, ld, p2, s_, o2
            step = jax.jit(local_step,
                           donate_argnums=(0, 1, 2) if donate else ())
        else:
            base = make_detection_train_step(model, opt, (),
                                             compute_dtype=jnp.bfloat16)
            if donate:
                step = base
            else:
                step = jax.jit(lambda p, s_, o, bt, tg, r:
                               base(p, s_, o, bt, tg, r))
        # donated buffers are invalidated — give each full-step variant its
        # own freshly-initialized trees (copying the shared ones pushed the
        # batch-16 step over the 15.75G HBM edge: the step runs that close)
        p2, s2 = model.init(jax.random.PRNGKey(0))
        o2 = opt.init(p2)
        out = step(p2, s2, o2, batch, targets, rng)
        float(out[0])  # compile + warm (consumes donated args)
        p2, s2, o2 = out[2], out[3], out[4]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(p2, s2, o2, batch, targets, rng)
            p2, s2, o2 = out[2], out[3], out[4]
        float(out[0])
        dt = (time.perf_counter() - t0) / args.iters
        emit(name, dt, {"img_s": round(b / dt, 2)})
        return step

    # the batch-16 step runs within ~150 MB of the HBM edge: when ONLY
    # full-step variants were requested (the recommended one-per-process
    # chunking), free the shared trees so the variant's fresh ones are the
    # only copies resident
    if not (stages - {"step", "step_nodonate", "remat", "dispatch",
                      "distill_unrolled"}):
        params = state = opt_state = None
    elif "opt" not in stages:
        opt_state = None  # ~166 MB the grad chains need back

    def guarded(name, fn, *a, **kw):
        try:
            fn(*a, **kw)
        except Exception as e:  # OOM at this shape is itself a finding
            full = str(e)
            path = f"/tmp/bwd_err_{name}.txt"
            with open(path, "w") as f:
                f.write(full)
            # the useful detail (e.g. "Ran out of memory in hbm") is at the
            # END, after the axon compile-helper's INFO spam
            lines = [l for l in full.split("\n") if l.strip()]
            msg = " | ".join([lines[0]] + lines[-3:])[:1500]
            print(json.dumps({"stage": name, "error": msg, "full": path,
                              "oom": "memory" in full.lower()}), flush=True)

    if "step" in stages:
        guarded("step_donated", run_full_step, "step_donated", donate=True)
    if "step_nodonate" in stages:
        guarded("step_nodonate", run_full_step, "step_nodonate",
                donate=False)
    if "remat" in stages:
        guarded("step_remat_backbone", run_full_step, "step_remat_backbone",
                donate=True, remat=True)

    # ------------------------------------------- fwd-only / grad-only splits
    if "fwd" in stages:
        @jax.jit
        def ffn(s, p):
            return truncated_loss(perturb(p, s), ("rpn", "roi"))
        guarded("loss_forward_only", lambda: emit(
            "loss_forward_only", chain_scalar(ffn, args.iters, params)))

    if "fwd_backbone" in stages:
        @jax.jit
        def fbfn(s, p):
            return truncated_loss(perturb(p, s), ("backbone",))
        guarded("fwd_backbone_fpn", lambda: emit(
            "fwd_backbone_fpn", chain_scalar(fbfn, args.iters, params)))

    if "fwd_unrolled" in stages:
        # round-4 train_bench methodology (in-jit unrolled chain) for
        # cross-harness calibration of the forward number
        @jax.jit
        def funroll(p):
            s = jnp.float32(0.0)
            for _ in range(args.iters):
                s = s + truncated_loss(perturb(p, s), ("rpn", "roi"))
            return s
        def run_funroll():
            float(funroll(params))
            t0 = time.perf_counter()
            float(funroll(params))
            emit("loss_forward_unrolled",
                 (time.perf_counter() - t0) / args.iters)
        guarded("loss_forward_unrolled", run_funroll)

    if "grad" in stages:
        guarded("grad_full_no_opt", grad_stage, "grad_full_no_opt",
                ("rpn", "roi"), donate=True)

    if "grad_backbone" in stages:
        guarded("grad_backbone_fpn",
                grad_stage, "grad_backbone_fpn", ("backbone",))
    if "grad_rpn" in stages:
        guarded("grad_backbone_plus_rpn",
                grad_stage, "grad_backbone_plus_rpn", ("rpn",))
    if "grad_roi" in stages:
        guarded("grad_backbone_plus_roi",
                grad_stage, "grad_backbone_plus_roi", ("roi",), donate=True)

    if "fwd_both" in stages:
        # same-process interleaved loop/unroll A/B of the loss forward —
        # run A (loop, separate process) saw 233 ms where run B's unrolled
        # chain saw 127; decide artifact vs drift with both in one process
        @jax.jit
        def ffn2(s, p):
            return truncated_loss(perturb(p, s), ("rpn", "roi"))

        @jax.jit
        def funroll2(p):
            s = jnp.float32(0.0)
            for _ in range(4):
                s = s + truncated_loss(perturb(p, s), ("rpn", "roi"))
            return s

        def one_loop():
            return chain_scalar(ffn2, args.iters, params)

        def one_unroll():
            float(funroll2(params))
            t0 = time.perf_counter()
            float(funroll2(params))
            return (time.perf_counter() - t0) / 4

        seq = {}
        for tag, fn in (("loop1", one_loop), ("unroll1", one_unroll),
                        ("loop2", one_loop), ("unroll2", one_unroll)):
            seq[tag] = round(fn() * 1000, 2)
        print(json.dumps({"stage": "fwd_loop_vs_unroll_interleaved",
                          **seq}), flush=True)

    if "step_unrolled" in stages:
        # 2 full supervised steps (incl optimizer) per dispatch: per-step
        # time halves the dispatch share vs the 1-per-dispatch step number
        def make_step2():
            def loss_fn(p):
                losses = rpn_and_roi_losses(p, backbone_fpn(
                    p, state, images), ("rpn", "roi"))
                return sum(jnp.asarray(v, jnp.float32)
                           for v in losses.values())

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step2(p, o):
                tot = jnp.float32(0.0)
                for _ in range(2):
                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    grads = apply_grad_mask(grads, trainable_mask(p, ()))
                    updates, o = opt.update(grads, o, p)
                    p = optax.apply_updates(p, updates)
                    tot = tot + loss
                return tot, p, o
            return step2

        def run_step2():
            step2 = make_step2()
            p_c, _ = model.init(jax.random.PRNGKey(0))
            o_c = opt.init(p_c)
            tot, p_c, o_c = step2(p_c, o_c)
            float(tot)  # compile + warm
            t0 = time.perf_counter()
            n = max(args.iters // 2, 2)
            for _ in range(n):
                tot, p_c, o_c = step2(p_c, o_c)
            float(tot)
            dt = (time.perf_counter() - t0) / (2 * n)
            emit("step_unrolled2_per_step", dt,
                 {"img_s": round(b / dt, 2)})
        guarded("step_unrolled2_per_step", run_step2)

    if "distill_unrolled" in stages:
        # WITHDRAWN as an on-chip measurement (BASELINE.md round-5 CSE
        # erratum): both inner steps share one batch and the teacher params
        # are loop constants, so XLA CSEs the frozen teacher forward across
        # the copies — the "2-per-dispatch" rate overcounts by the teacher
        # share (~13%).  Kept only to reproduce the artifact; use
        # tools/onchip_ab.py (distinct batches per copy) for the truth.
        def run_distill2():
            from bench import build_distill_bench
            dstep, (tp, ts), (sp, ss, os_), dbatch, dkey = \
                build_distill_bench()

            # loop baseline (bench.py's own measurement, same process)
            loss = None
            sp2, ss2, os2 = sp, ss, os_
            for _ in range(2):
                loss, _, sp2, ss2, os2 = dstep(tp, ts, sp2, ss2, os2,
                                               dbatch, dkey)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                loss, _, sp2, ss2, os2 = dstep(tp, ts, sp2, ss2, os2,
                                               dbatch, dkey)
            float(loss)
            dt_loop = (time.perf_counter() - t0) / args.iters
            bsz = dbatch["images"].shape[0]
            emit("distill_step_loop", dt_loop,
                 {"img_s": round(bsz / dt_loop, 2)})

            # 2 steps per dispatch (jit-of-jit inlines the step body)
            @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
            def dstep2(tp, ts, sp, ss, os_, batch, key):
                l1, _, sp, ss, os_ = dstep(tp, ts, sp, ss, os_, batch, key)
                l2, _, sp, ss, os_ = dstep(tp, ts, sp, ss, os_, batch, key)
                return l1 + l2, sp, ss, os_

            tot, sp2, ss2, os2 = dstep2(tp, ts, sp2, ss2, os2, dbatch, dkey)
            float(tot)
            n = max(args.iters // 2, 2)
            t0 = time.perf_counter()
            for _ in range(n):
                tot, sp2, ss2, os2 = dstep2(tp, ts, sp2, ss2, os2, dbatch,
                                            dkey)
            float(tot)
            dt2 = (time.perf_counter() - t0) / (2 * n)
            emit("distill_step_unrolled2_per_step", dt2,
                 {"img_s": round(bsz / dt2, 2),
                  "dispatch_share_ms": round((dt_loop - dt2) * 1000, 2)})
        guarded("distill_step_loop", run_distill2)

    if "grad_unrolled" in stages:
        guarded("grad_full_unrolled", grad_stage_unrolled,
                "grad_full_unrolled", ("rpn", "roi"), 2)
    if "grad_backbone_unrolled" in stages:
        guarded("grad_backbone_unrolled", grad_stage_unrolled,
                "grad_backbone_unrolled", ("backbone",), 4)
    if "grad_rpn_unrolled" in stages:
        guarded("grad_rpn_unrolled", grad_stage_unrolled,
                "grad_rpn_unrolled", ("rpn",), 4)
    if "grad_roi_unrolled" in stages:
        guarded("grad_roi_unrolled", grad_stage_unrolled,
                "grad_roi_unrolled", ("roi",), 4)

    # --------------------------------------------------------------- opt
    if "opt" in stages:
        fixed_grads = jax.tree_util.tree_map(
            lambda x: jnp.ones_like(x) * jnp.asarray(1e-6, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.inexact) else x, params)

        @jax.jit
        def ofn(s, p, o):
            gr = perturb(fixed_grads, s)
            gr = apply_grad_mask(gr, trainable_mask(p, ()))
            updates, o2 = opt.update(gr, o, p)
            p2 = optax.apply_updates(p, updates)
            return tree_scalar(p2) + tree_scalar(o2)
        emit("optimizer_update_only",
             chain_scalar(ofn, args.iters, params, opt_state))

    # ------------------------------------------------------ XLA cost/memory
    if "xcost" in stages:
        def report_cost(name, fn, *fargs):
            lowered = jax.jit(fn).lower(*fargs)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            rec = {"stage": f"xcost_{name}",
                   "flops_g": round(float(cost.get("flops", 0)) / 1e9, 1),
                   "bytes_gb": round(float(
                       cost.get("bytes accessed", 0)) / 1e9, 2)}
            try:
                mem = compiled.memory_analysis()
                rec["temp_mb"] = round(mem.temp_size_in_bytes / 1e6, 1)
                rec["peak_args_out_mb"] = round(
                    (mem.argument_size_in_bytes
                     + mem.output_size_in_bytes) / 1e6, 1)
            except Exception:
                pass
            print(json.dumps(rec), flush=True)

        report_cost("fwd", lambda p: truncated_loss(p, ("rpn", "roi")),
                    params)
        report_cost("grad", lambda p: tree_scalar(jax.grad(
            lambda q: truncated_loss(q, ("rpn", "roi")))(p)), params)
        report_cost("grad_remat_backbone", lambda p: tree_scalar(jax.grad(
            lambda q: truncated_loss(q, ("rpn", "roi"), ckpt=True))(p)),
            params)


if __name__ == "__main__":
    main()
