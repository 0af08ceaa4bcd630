"""Single-image prediction visualizer CLI.

Parity surface: src/visualizer.py — loads a trained model from the config,
runs inference on each input image, and writes box/mask/keypoint overlays.
"""
from __future__ import annotations

import argparse
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.data import transforms as T
from hnd_ghnd_tpu.evals.postprocess import finalize_predictions
from hnd_ghnd_tpu.models.factory import get_model
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.utils import ckpt as ckpt_util
from hnd_ghnd_tpu.utils.visual_util import render_predictions


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Prediction visualizer")
    common.add_common_args(parser)
    parser.add_argument("--image", nargs="+", required=True,
                        help="input image path(s)")
    parser.add_argument("--output", default="./visualized",
                        help="output directory")
    parser.add_argument("--score_threshold", type=float, default=0.7)
    parser.add_argument("-transform_bottleneck", action="store_true")
    return parser


def predict(model, params, state, image: np.ndarray, tpu_cfg,
            use_bottleneck_transformer: bool, jits: common.JitCache):
    min_size = int(tpu_cfg.get("min_sizes", [800])[-1])
    max_size = int(tpu_cfg.get("max_size", 1333))
    buckets = tuple(tuple(b) for b in
                    tpu_cfg.get("buckets", T.DEFAULT_BUCKETS))
    oh, ow = image.shape[:2]
    resized, _, _ = T.resize(image, None, min_size, max_size)
    bucket = T.pick_bucket(resized.shape[0], resized.shape[1], buckets)
    batch = {
        "images": jnp.asarray(T.pad_to(resized, bucket)[None]
                              .astype(np.float32) / 255.0),
        "image_sizes": jnp.asarray([[resized.shape[0], resized.shape[1]]],
                                   jnp.int32),
        "original_sizes": jnp.asarray([[oh, ow]], jnp.int32),
    }
    fwd = jits.eval_forward(batch["images"].shape, use_bottleneck_transformer)
    dets = {k: np.asarray(v) for k, v in fwd(params, state, batch).items()}
    return finalize_predictions(dets, 0, (oh, ow),
                                (resized.shape[0], resized.shape[1]))


def main(args):
    config = overwrite_config(load_config(args.config), args.json)
    model_cfg = config.get("student_model", config.get("model"))
    model, params, state = get_model(model_cfg, seed=args.seed)
    if ckpt_util.check_if_exists(model_cfg.get("ckpt")):
        payload = ckpt_util.load_ckpt(model_cfg["ckpt"])
        params = payload["params"]
        state = payload["state"] or state

    os.makedirs(args.output, exist_ok=True)
    # directories expand to their image files (reference get_file_path_list)
    paths = []
    for p_ in args.image:
        if os.path.isdir(p_):
            paths.extend(sorted(
                os.path.join(p_, f) for f in os.listdir(p_)
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))))
        else:
            paths.append(p_)
    jits = common.JitCache(model)
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        pred = predict(model, params, state, img, config.get("tpu", {}),
                       args.transform_bottleneck, jits)
        out = render_predictions(img, pred, args.score_threshold)
        out_path = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        n = int((pred["scores"] >= args.score_threshold).sum())
        print(f"{path}: {n} detections >= {args.score_threshold} "
              f"-> {out_path}")


def cli():
    main(get_argparser().parse_args())


if __name__ == "__main__":
    cli()
