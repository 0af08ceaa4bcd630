"""Ext neural-filter learning validation (runs on one chip).

Trains the 2-class filter on a synthetic fixture where ~45% of images are
empty; the filter must learn to separate them (round-1 result on TPU v5e:
ROC-AUC 1.000 after 40 epochs of 4 batches — see BASELINE.md).

Usage: python tools/ext_demo.py [--epochs 40]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--out", default="/tmp/ext_demo")
    args = p.parse_args()

    from fixtures import make_coco_fixture
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hnd_ghnd_tpu.data.coco import CocoDataset
    from hnd_ghnd_tpu.data.loader import DetectionLoader
    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import build_optimizer, make_mesh, replicate
    from hnd_ghnd_tpu.runners.ext_runner import (
        collect_probs, host_target_to_ext_label, make_ext_train_step,
        print_threshold_table, summarize_cls)

    img_dir, ann_file = make_coco_fixture(args.out, num_images=16, seed=21,
                                          num_classes=2, empty_prob=0.45)
    ds = CocoDataset(img_dir, ann_file)
    loader = DetectionLoader(ds, 4, training=True, min_sizes=(64,),
                             max_size=96, buckets=((96, 96),),
                             hflip_prob=0.0, num_workers=2)
    eval_loader = DetectionLoader(ds, 1, training=False, min_sizes=(64,),
                                  max_size=96, buckets=((96, 96),),
                                  num_workers=2)
    model = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False, "freeze_layers": True,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}},
                     "ext_config": {"backbone_frozen": True,
                                    "threshold": 0.01}},
        "params": {"num_classes": 3}})
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:1])
    opt, _ = build_optimizer({"type": "SGD", "params": {
        "lr": 0.01, "momentum": 0.9, "weight_decay": 0.0}})
    step = make_ext_train_step(model, opt, mesh)
    pr, sr, orr = (replicate(x, mesh)
                   for x in (params, state, opt.init(params)))
    data = NamedSharding(mesh, P("data"))
    batches = list(loader)
    for epoch in range(args.epochs):
        for batch, _, host in batches:
            labels = jnp.asarray(
                [host_target_to_ext_label(t, False) for t in host], jnp.int32)
            loss, pr, sr, orr = step(
                pr, sr, orr,
                jax.device_put(jnp.asarray(batch["images"]), data),
                jax.device_put(labels, data))
    print(f"final CE loss: {float(loss):.6f}")
    probs, labels = collect_probs(model, pr, sr, eval_loader, False)
    _, _, _, auc = summarize_cls(probs, labels)
    print_threshold_table(probs, labels, min_recall=0.98)
    print(f"RESULT ext-filter ROC-AUC={auc:.4f}")


if __name__ == "__main__":
    main()
