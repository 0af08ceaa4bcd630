"""Complexity analyzer: hierarchical parameter counts + intermediate tensor
sizes per backbone stage.

CLI replacement for the reference's src/complexity_analyzer.ipynb
(``count_model_params`` tables; per-component tensor-size analysis that
motivated splitting at layer1 — the earliest point where the feature tensor
is smaller than the input).

Usage: python tools/complexity_analyzer.py --model faster_rcnn \
           [--bottleneck 3] [--height 800 --width 800]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def param_table(params, prefix="", depth=2, out=None):
    out = out if out is not None else []
    from hnd_ghnd_tpu.utils.params import count_params
    if isinstance(params, dict) and depth > 0 and any(
            isinstance(v, dict) for v in params.values()):
        for k in params:
            param_table(params[k], f"{prefix}.{k}" if prefix else k,
                        depth - 1, out)
    else:
        out.append((prefix, count_params(params)))
    return out


def tensor_size_report(model, params, state, h, w):
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    input_kb = np.prod(images.shape) * 4 / 1024
    print(f"input  {tuple(images.shape)}  {input_kb:9.1f} KB (fp32)")
    feats, _, _ = model.body.apply(params["backbone"]["body"],
                                   state["backbone"]["body"],
                                   model.normalize(images))
    for name in ("layer1", "layer2", "layer3", "layer4"):
        f = feats[name]
        kb = np.prod(f.shape) * 4 / 1024
        marker = "  <= smaller than input" if kb < input_kb else ""
        print(f"{name:6s} {tuple(f.shape)}  {kb:9.1f} KB{marker}")
    if model.bottleneck is not None:
        x = model.body.stem(params["backbone"]["body"], model.normalize(images))
        z, _ = model.bottleneck.encode(
            params["backbone"]["body"]["layer1"],
            state["backbone"]["body"]["layer1"], x, training=False)
        kb32 = np.prod(z.shape) * 4 / 1024
        print(f"bottleneck z {tuple(z.shape)}  fp32 {kb32:.1f} KB  "
              f"fp16 {kb32 / 2:.1f} KB  int8 {kb32 / 4:.1f} KB  "
              f"({100 * (kb32 / 4) / (input_kb / 4 * 1):.1f}% of uint8 input)")


def main():
    from hnd_ghnd_tpu.models.factory import build_model
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="faster_rcnn",
                   choices=["faster_rcnn", "mask_rcnn", "keypoint_rcnn"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--bottleneck", type=int, default=None)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    backbone = {"name": args.backbone,
                "params": {"pretrained": False, "freeze_layers": False}}
    if args.bottleneck:
        backbone["name"] = f"custom_{args.backbone}" \
            if not args.backbone.startswith("custom_") else args.backbone
        backbone["params"]["layer1"] = {
            "name": "Bottleneck4LargeResNet",
            "bottleneck_channel": args.bottleneck}
    model = build_model({"name": args.model, "backbone": backbone,
                         "params": {"num_classes": 91}})
    params, state = model.init(jax.random.PRNGKey(0))

    print("== parameter counts ==")
    total = 0
    for name, n in param_table(params, depth=2):
        print(f"{name:32s} {n:>12,}")
        total += n
    print(f"{'TOTAL':32s} {total:>12,}")
    print()
    print(f"== intermediate tensor sizes at {args.height}x{args.width} ==")
    tensor_size_report(model, params, state, args.height, args.width)


if __name__ == "__main__":
    main()
