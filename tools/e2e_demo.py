"""End-to-end learning demonstration on synthetic data (runs on one chip).

Pipeline proof: (1) train a Faster R-CNN teacher to overfit a tiny synthetic
COCO set (coco_runner path), (2) GHND-distill a bottleneck-3 student from it
(mimic_runner path), (3) evaluate both with the COCO evaluator — the student
should recover most of the teacher's mAP through an 8-bit bottleneck.

Usage: python tools/e2e_demo.py [--steps 300] [--distill_steps 400]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--distill_steps", type=int, default=400)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--out", default="/tmp/e2e_demo")
    p.add_argument("--distill_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--kind", default="faster_rcnn",
                   choices=["faster_rcnn", "mask_rcnn", "keypoint_rcnn"])
    p.add_argument("--skip_distill", action="store_true")
    p.add_argument("--roi_ab", action="store_true",
                   help="after training, evaluate with BOTH RoIAlign "
                        "implementations (xla / pallas) and report both "
                        "mAPs — accuracy evidence for the auto default")
    p.add_argument("--kp_ab", action="store_true",
                   help="(keypoint_rcnn) after training, evaluate with the "
                        "host heatmap decode AND the device static-grid "
                        "decode (ops/kp_decode.py) and report both mAPs — "
                        "exactness evidence for kp_decode: device")
    args = p.parse_args()

    from fixtures import make_coco_fixture
    from hnd_ghnd_tpu.data.coco import CocoDataset
    from hnd_ghnd_tpu.data.loader import DetectionLoader
    from hnd_ghnd_tpu.distill.box import DistillationBox
    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                            make_detection_train_step,
                                            make_distill_train_step)
    from hnd_ghnd_tpu.runners import common

    kind = args.kind
    img_dir, ann_file = make_coco_fixture(
        args.out, num_images=args.images, seed=11,
        num_classes=1 if kind == "keypoint_rcnn" else 3,
        keypoints=kind == "keypoint_rcnn")
    ds = CocoDataset(img_dir, ann_file,
                     with_masks=kind == "mask_rcnn",
                     with_keypoints=kind == "keypoint_rcnn")
    buckets = ((96, 96),)
    train_loader = DetectionLoader(ds, 8, training=True, min_sizes=(64,),
                                   max_size=96, buckets=buckets,
                                   hflip_prob=0.0, num_workers=2)
    test_loader = DetectionLoader(ds, 1, training=False, min_sizes=(64,),
                                  max_size=96, buckets=buckets, num_workers=2)

    num_classes = 2 if kind == "keypoint_rcnn" else 4
    teacher = build_model({
        "name": kind,
        "backbone": {"name": "resnet50",
                     "params": {"pretrained": False, "freeze_layers": False}},
        "params": {"num_classes": num_classes,
                   **({"num_keypoints": 17} if kind == "keypoint_rcnn" else {})}})
    t_params, t_state = teacher.init(jax.random.PRNGKey(0))

    # ---- phase 1: overfit the teacher -------------------------------------
    opt, _ = build_optimizer({"type": "SGD", "params": {
        "lr": 0.02, "momentum": 0.9, "weight_decay": 0.0}}, None, 1)
    step = make_detection_train_step(teacher, opt, (),
                                     compute_dtype=jnp.bfloat16)
    opt_state = opt.init(t_params)
    batches = list(train_loader)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    done = 0
    while done < args.steps:
        for batch, targets, _ in batches:
            rng, key = jax.random.split(rng)
            loss, loss_dict, t_params, t_state, opt_state = step(
                t_params, t_state, opt_state,
                {k: jnp.asarray(v) for k, v in batch.items()},
                {k: jnp.asarray(v) for k, v in targets.items()}, key)
            done += 1
            if done % 50 == 0 or done == 1:
                print(f"teacher step {done}: loss {float(loss):.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if done >= args.steps:
                break

    print("== teacher eval ==", flush=True)
    tev = common.evaluate(teacher, t_params, t_state, test_loader)
    teacher_map = float(tev.stats["bbox"][0])

    if args.roi_ab:
        # same params, same eval — only the pooling program differs
        import json
        ab = {}
        for impl in ("xla", "pallas"):
            m2 = build_model({
                "name": kind,
                "backbone": {"name": "resnet50",
                             "params": {"pretrained": False,
                                        "freeze_layers": False}},
                "params": {"num_classes": num_classes,
                           "roi_pool_impl": impl,
                           **({"num_keypoints": 17}
                              if kind == "keypoint_rcnn" else {})}})
            ev = common.evaluate(m2, t_params, t_state, test_loader)
            ab[impl] = {t: round(float(s[0]), 4) for t, s in ev.stats.items()}
        print(json.dumps({"roi_ab": ab,
                          "delta_bbox": round(ab["pallas"]["bbox"]
                                              - ab["xla"]["bbox"], 5)}),
              flush=True)

    if args.kp_ab:
        assert kind == "keypoint_rcnn", "--kp_ab needs --kind keypoint_rcnn"
        import json
        ab = {}
        for decode in ("host", "device"):
            m2 = build_model({
                "name": kind,
                "backbone": {"name": "resnet50",
                             "params": {"pretrained": False,
                                        "freeze_layers": False}},
                "params": {"num_classes": num_classes, "num_keypoints": 17,
                           "kp_decode": decode}})
            ev = common.evaluate(m2, t_params, t_state, test_loader)
            ab[decode] = {t: round(float(s[0]), 4)
                          for t, s in ev.stats.items()}
        print(json.dumps({"kp_ab": ab,
                          "delta_keypoints": round(
                              ab["device"]["keypoints"]
                              - ab["host"]["keypoints"], 5)}), flush=True)

    if args.skip_distill:
        extra = {t: float(s[0]) for t, s in tev.stats.items()}
        print(f"\nRESULT {kind} teacher stats: {extra}")
        return

    # ---- phase 2: GHND-distill the student --------------------------------
    student = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False, "freeze_layers": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}}},
        "bottleneck_transformer": {
            "order": ["quantizer", "dequantizer"],
            "components": {"quantizer": {"params": {"num_bits": 8}},
                           "dequantizer": {"params": {"num_bits": 8}}}},
        "params": {"num_classes": 4}})
    s_params, s_state = student.init(jax.random.PRNGKey(2))
    # student inherits the teacher's frozen parts (pretrained=True semantics)
    for k in ("conv1", "bn1", "layer2", "layer3", "layer4"):
        s_params["backbone"]["body"][k] = t_params["backbone"]["body"][k]
    s_params["backbone"]["fpn"] = t_params["backbone"]["fpn"]
    s_params["rpn"] = t_params["rpn"]
    s_params["roi_heads"] = t_params["roi_heads"]

    criterion = {"type": "general", "params": {"org_loss_factor": 0.0},
                 "terms": {f"layer{i}": {
                     "ts_modules": [f"backbone.body.layer{i}"] * 2,
                     "criterion": {"type": "MSELoss",
                                   "params": {"reduction": "sum"}},
                     "factor": 1.0} for i in (1, 2, 3, 4)}}
    frozen = ["backbone.body.layer2", "backbone.body.layer3",
              "backbone.body.layer4", "backbone.fpn", "rpn", "roi_heads"]
    box = DistillationBox(teacher, student, criterion)
    dopt, _ = build_optimizer({"type": "Adam", "params": {"lr": 1e-3}})
    dstep = make_distill_train_step(
        box, dopt, frozen, donate=False,
        compute_dtype=jnp.bfloat16 if args.distill_dtype == "bfloat16"
        else jnp.float32)
    dopt_state = dopt.init(s_params)
    losses = []
    done = 0
    while done < args.distill_steps:
        for batch, _, _ in batches:
            rng, key = jax.random.split(rng)
            loss, _, s_params, s_state, dopt_state = dstep(
                t_params, t_state, s_params, s_state, dopt_state,
                {k: jnp.asarray(v) for k, v in batch.items()}, key)
            losses.append(float(loss))
            done += 1
            if done % 100 == 0 or done == 1:
                print(f"distill step {done}: loss {losses[-1]:.1f}", flush=True)
            if done >= args.distill_steps:
                break

    print("== student eval (no transformer) ==", flush=True)
    sev_raw = common.evaluate(student, s_params, s_state, test_loader)
    print("== student eval (8-bit bottleneck transformer ON) ==", flush=True)
    sev = common.evaluate(student, s_params, s_state, test_loader,
                          use_bottleneck_transformer=True)
    student_map = float(sev.stats["bbox"][0])
    print(f"student mAP raw={float(sev_raw.stats['bbox'][0]):.4f} "
          f"quantized={student_map:.4f}")

    print(f"\nRESULT teacher mAP={teacher_map:.4f} "
          f"student mAP={student_map:.4f} "
          f"retention={100 * student_map / max(teacher_map, 1e-9):.1f}% "
          f"distill loss {losses[0]:.1f} -> {losses[-1]:.1f}")


if __name__ == "__main__":
    main()
