"""Eval-path stage attribution on TPU (VERDICT round-2 item 6).

Times the batch-8 detector eval forward and its stages with the corrected
chained measurement (K dependent applications inside one jit, one final
scalar sync — a per-call host read costs ~26 ms on this tunneled backend and
would swamp every stage).

Stages: full forward | backbone+FPN | RPN propose | RoI stage (infer), and
inside the RoI stage: the RoIAlign gather, the box head matmuls, and the
per-image postprocess (softmax/decode/clip/top-k/NMS) — so the RoI-stage
milliseconds are attributed component by component.

Usage: python tools/eval_bench.py [--batch 8] [--hw 832,1344] [--iters 10]
Prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _first_leaf_scalar(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return leaf.ravel()[0].astype(jnp.float32)


def chain_time(name, fn, args, iters, perturb_path=0):
    """Compile fn, then run `iters` data-dependent applications inside one
    jit; returns seconds per application (one final host read)."""

    leaves, treedef = jax.tree_util.tree_flatten(args)

    @jax.jit
    def chained(*flat):
        s = jnp.float32(0.0)
        out = None
        for _ in range(iters):
            cur = list(flat)
            # inject the chain scalar into one float leaf (epsilon-scaled:
            # value-neutral, dependency-real).  Cast the perturbation to the
            # leaf dtype BEFORE the add — f32-scalar + bf16-leaf would
            # silently promote just this leaf to f32 (mixed-dtype FPN levels
            # downstream).
            eps = (s * jnp.float32(1e-30)).astype(cur[perturb_path].dtype)
            cur[perturb_path] = cur[perturb_path] + eps
            out = fn(*jax.tree_util.tree_unflatten(treedef, cur))
            s = s + _first_leaf_scalar(out)
        return s

    # warmup/compile
    float(chained(*leaves))
    t0 = time.perf_counter()
    float(chained(*leaves))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1000, 2)}), flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="832,1344")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--int8_pool", action="store_true",
                    help="measure with the opt-in int8 RoI pooling table "
                         "(model params int8_roi_pool)")
    ap.add_argument("--roi_impl", choices=("auto", "xla", "pallas"),
                    default="auto",
                    help="eval-path RoIAlign program (model params "
                         "roi_pool_impl; auto = pallas on TPU)")
    ap.add_argument("--kind", choices=("faster_rcnn", "mask_rcnn",
                                       "keypoint_rcnn"),
                    default="faster_rcnn",
                    help="detector family to benchmark (VERDICT r3 #2: "
                         "mask/keypoint TPU numbers)")
    ap.add_argument("--bb_detail", action="store_true",
                    help="sub-attribute the backbone+FPN stage (stem / "
                         "layer1-4 / FPN), its MFU from XLA cost analysis, "
                         "and the normalize-fold lever (VERDICT r4 #9)")
    ap.add_argument("--kp_decode", choices=("host", "device"),
                    default="host",
                    help="(keypoint_rcnn) heatmap decode placement; "
                         "'device' = static-grid argmax on device "
                         "(ops/kp_decode.py) — run both to A/B the "
                         "worst-case host postprocess")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))
    b = args.batch

    import __graft_entry__ as ge
    from hnd_ghnd_tpu.models.factory import build_model

    cfg = ge._student_config()
    if args.int8_pool:
        cfg = dict(cfg, params=dict(cfg["params"], int8_roi_pool=True))
    cfg = dict(cfg, params=dict(cfg["params"], roi_pool_impl=args.roi_impl))
    if args.kind != "faster_rcnn":
        cfg = dict(cfg, name=args.kind)  # factory reads the family here
    if args.kind == "keypoint_rcnn":
        cfg = dict(cfg, params=dict(cfg["params"], kp_decode=args.kp_decode))
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (b, h, w, 3), dtype)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)
    osizes = jnp.asarray([[480, 640]] * b, jnp.int32)
    batch = {"images": images, "image_sizes": sizes,
             "original_sizes": osizes}
    image_shape = (h, w)

    # ---------------------------------------------------------------- full
    def _touch_all(tree):
        """Reduce EVERY float leaf into the chain scalar — returning just
        `scores` lets XLA dead-code-eliminate the mask/keypoint branches
        (measured: mask_rcnn timed identical to faster_rcnn before this)."""
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + jnp.mean(leaf).astype(jnp.float32)
        return tot

    def full(images):
        dets, _, _ = model.forward(params, state,
                                   dict(batch, images=images),
                                   training=False,
                                   use_bottleneck_transformer=True)
        return _touch_all(dets)

    t_full = chain_time("full_forward", full, (images,), args.iters)
    print(json.dumps({"stage": "full_img_s",
                      "value": round(b / t_full, 1)}), flush=True)

    if args.kind != "faster_rcnn":
        # host-side postprocess cost (VERDICT r3 #2): mask pasting /
        # keypoint heatmap decode run on HOST inside the lag-1 eval
        # pipeline — measure whether a batch of 100-det mask/kp payloads
        # still hides under the device step
        from hnd_ghnd_tpu.evals.postprocess import finalize_predictions

        def full_dets(images):
            dets, _, _ = model.forward(params, state,
                                       dict(batch, images=images),
                                       training=False,
                                       use_bottleneck_transformer=True)
            return dets

        host_dets = jax.device_get(jax.jit(full_dets)(images))  # one fetch
        # untrained weights emit ~zero valid detections (softmax ~1/91 <
        # score_thresh), which would make the paste loop vacuous — force the
        # WORST-CASE payload: every det slot valid with a plausible box
        rng = np.random.default_rng(0)
        d = host_dets["valid"].shape[1]
        host_dets = dict(host_dets)
        host_dets["valid"] = np.ones((b, d), bool)
        x1 = rng.uniform(0, 1000, (b, d))
        y1 = rng.uniform(0, 600, (b, d))
        host_dets["boxes"] = np.stack(
            [x1, y1, x1 + rng.uniform(8, 300, (b, d)),
             y1 + rng.uniform(8, 300, (b, d))], axis=-1).astype(np.float32)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            for i in range(b):
                finalize_predictions(host_dets, i, (480, 640), (800, 1333))
        t_pp = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "stage": "host_postprocess_ms_per_batch",
            "value": round(t_pp * 1000, 2),
            "dets_per_image": int(d),
            "hidden_by_lag1": bool(t_pp < t_full),
        }), flush=True)

    # ------------------------------------------------------- backbone+FPN
    def bb(images):
        _, fpn_feats, _, _ = model.backbone_features(
            params, state, images, training=False,
            use_bottleneck_transformer=True)
        return fpn_feats

    t_bb = chain_time("backbone_fpn", bb, (images,), args.iters)

    if args.bb_detail:
        # VERDICT r4 #9: split the (round-4 largest) backbone+FPN eval stage
        # into stem / layer1..4 / FPN, compute its MFU from XLA's own cost
        # analysis, and test the one untried cheap lever (normalize folded
        # out of the elementwise path).
        body_p = params["backbone"]["body"]
        body_s = state["backbone"]["body"]

        def stem_fn(images):
            return model.body.stem(body_p, model.normalize(images))

        t_stem = chain_time("bb_stem_norm_conv1_pool", stem_fn, (images,),
                            args.iters)

        def stem_nonorm(images):  # the lever: is the normalize even visible?
            return model.body.stem(body_p, images)

        t_stem_nn = chain_time("bb_stem_no_normalize", stem_nonorm,
                               (images,), args.iters)
        print(json.dumps({
            "stage": "bb_normalize_fold_lever",
            "normalize_cost_ms": round((t_stem - t_stem_nn) * 1000, 2),
            "verdict": ("refuted: normalize already fused/negligible"
                        if (t_stem - t_stem_nn) * 1000 < 1.0 else
                        "normalize costs real time - fold into conv1"),
        }), flush=True)

        y = jax.block_until_ready(jax.jit(stem_fn)(images))
        feats_by_stage = []
        for stage in range(4):
            if stage == 0 and model.body.injected_layer1 is not None:
                def l1_fn(y):
                    out, _, _ = model.body.injected_layer1.apply(
                        body_p["layer1"], body_s["layer1"], y,
                        training=False, use_bottleneck_transformer=True)
                    return out
                chain_time("bb_layer1_bottleneck", l1_fn, (y,), args.iters)
                y = jax.block_until_ready(jax.jit(l1_fn)(y))
            else:
                def stage_fn(y, stage=stage):
                    return model.body._apply_stage(body_p, y, stage)
                chain_time(f"bb_layer{stage + 1}", stage_fn, (y,),
                           args.iters)
                y = jax.block_until_ready(jax.jit(stage_fn)(y))
            feats_by_stage.append(y)

        def fpn_only(feats):
            return model.fpn.apply(params["backbone"]["fpn"], feats)

        chain_time("bb_fpn_only", fpn_only, (feats_by_stage,), args.iters)

        cost = jax.jit(bb).lower(images).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        tflops_s = flops / t_bb / 1e12
        print(json.dumps({
            "stage": "bb_mfu",
            "flops_g": round(flops / 1e9, 1),
            "tflops_s": round(tflops_s, 1),
            "mfu_pct_v5e_bf16": round(100 * tflops_s / 197.0, 1),
            "bytes_gb": round(float(cost.get("bytes accessed", 0)) / 1e9, 2),
        }), flush=True)

    fpn_feats = jax.jit(bb)(images)
    fpn_feats = jax.tree_util.tree_map(jax.block_until_ready, fpn_feats)
    print(json.dumps({"stage": "fpn_dtype",
                      "value": str(fpn_feats[0].dtype)}), flush=True)

    # --------------------------------------------------------------- RPN
    def rpn_fn(feats):
        proposals, prop_valid, _ = model.rpn.propose(
            params["rpn"], feats, sizes, image_shape, training=False)
        return proposals, prop_valid

    t_rpn = chain_time("rpn_propose", rpn_fn, (fpn_feats,), args.iters)
    proposals, prop_valid = jax.jit(rpn_fn)(fpn_feats)
    proposals = jax.block_until_ready(proposals)

    # --------------------------------------------------------- RoI stage
    def roi_fn(feats, props):
        dets = model.roi_heads.infer(params["roi_heads"], feats, props,
                                     prop_valid, sizes, image_shape)
        return _touch_all(dets)

    t_roi = chain_time("roi_stage", roi_fn, (fpn_feats, proposals),
                       args.iters)

    # RoI sub-stages -------------------------------------------------------
    from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align_batch

    def pool_fn(feats, props):
        return multiscale_roi_align_batch(
            feats[:4], props, image_shape,
            model.roi_heads.cfg.box_pool_size, boxes_valid=prop_valid)

    t_pool = chain_time("roi_align_gather", pool_fn, (fpn_feats, proposals),
                        args.iters)

    def pool_fn_int8(feats, props):
        return multiscale_roi_align_batch(
            feats[:4], props, image_shape,
            model.roi_heads.cfg.box_pool_size, boxes_valid=prop_valid,
            quant="int8")

    chain_time("roi_align_gather_int8", pool_fn_int8,
               (fpn_feats, proposals), args.iters)

    from hnd_ghnd_tpu.ops.pallas_roi import pallas_multiscale_roi_align_batch

    def pool_fn_pallas(feats, props):
        return pallas_multiscale_roi_align_batch(
            feats[:4], props, image_shape,
            model.roi_heads.cfg.box_pool_size, boxes_valid=prop_valid)

    if jax.default_backend() == "tpu":  # interpret mode would crawl on CPU
        try:
            chain_time("roi_align_pallas", pool_fn_pallas,
                       (fpn_feats, proposals), args.iters)
        except Exception as exc:  # Mosaic rejection: record, keep benching
            print(json.dumps({"stage": "roi_align_pallas",
                              "error": str(exc)[:300]}), flush=True)
    pooled = jax.block_until_ready(jax.jit(pool_fn)(fpn_feats, proposals))
    r = proposals.shape[1]

    def head_fn(pooled):
        rep = model.roi_heads.box_head.apply(
            params["roi_heads"]["box_head"],
            pooled.reshape((b * r,) + pooled.shape[2:]))
        cls, deltas = model.roi_heads.box_predictor.apply(
            params["roi_heads"]["box_predictor"], rep)
        return cls, deltas

    t_head = chain_time("box_head", head_fn, (pooled,), args.iters)
    cls, deltas = jax.jit(head_fn)(pooled)
    cls = jax.block_until_ready(cls)

    # postprocess = RoI stage minus pool minus head (all jitted separately;
    # small fusion slack) plus a direct measurement of its two hot ops.
    # Subtract the pool time of the impl the MODEL actually ran (t_roi used
    # cfg.roi_pool_impl; t_pool above is always the XLA program).
    t_pool_model = t_pool
    if model.roi_heads.cfg.resolved_pool_impl() == "pallas":
        def pool_model_fn(feats, props):
            return pallas_multiscale_roi_align_batch(
                feats[:4], props, image_shape,
                model.roi_heads.cfg.box_pool_size, boxes_valid=prop_valid)
        t_pool_model = chain_time("roi_align_model_impl", pool_model_fn,
                                  (fpn_feats, proposals), args.iters)
    print(json.dumps({"stage": "roi_post_residual_ms",
                      "ms": round((t_roi - t_pool_model - t_head) * 1000, 2)}),
          flush=True)

    ncls = model.roi_heads.cfg.num_classes
    fg = r * (ncls - 1)
    scores_flat = jax.random.uniform(key, (b, fg), jnp.float32)

    def topk_fn(s):
        return jax.vmap(lambda x: jax.lax.top_k(x, min(4096, fg)))(s)[0]

    t_topk = chain_time("topk_90k_to_4096", topk_fn, (scores_flat,),
                        args.iters)

    from hnd_ghnd_tpu.ops import nms as nms_ops
    bxs = jax.random.uniform(key, (b, 4096, 4), jnp.float32) * 800
    bxs = bxs.at[..., 2:].set(bxs[..., :2] + 16.0)
    scs = jax.random.uniform(key, (b, 4096), jnp.float32)
    lbl = jax.random.randint(key, (b, 4096), 1, ncls, jnp.int32)

    def nms_fn(bxs, scs):
        def one(bx, sc, lb):
            return nms_ops.batched_nms(
                bx, sc, lb, model.roi_heads.cfg.nms_thresh,
                model.roi_heads.cfg.detections_per_img,
                jnp.ones(bx.shape[0], bool))[0]
        return jax.vmap(one)(bxs, scs, lbl)

    t_nms = chain_time("batched_nms_4096", nms_fn, (bxs, scs), args.iters)

    print(json.dumps({
        "summary": {
            "full_ms": round(t_full * 1000, 2),
            "backbone_fpn_ms": round(t_bb * 1000, 2),
            "rpn_ms": round(t_rpn * 1000, 2),
            "roi_ms": round(t_roi * 1000, 2),
            "roi_align_ms": round(t_pool * 1000, 2),
            "box_head_ms": round(t_head * 1000, 2),
            "topk_ms": round(t_topk * 1000, 2),
            "nms_ms": round(t_nms * 1000, 2),
            "img_s": round(b / t_full, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
