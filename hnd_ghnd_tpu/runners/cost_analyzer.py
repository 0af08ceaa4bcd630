"""Offline cost analysis CLI: parameters, payload sizes, split latency.

Parity surface: src/cost_analyzer.py — four analyses selected by flags:
  * model/head/tail parameter counts (:38-53);
  * dataset JPEG payload sizes + communication-delay table over data rates
    0.5-10 Mbps with delay = KB*8/(Mbps*1000) seconds (:56-68, :89-137);
  * bottleneck tensor payload at fp32/fp16/int8 via DataLogger (:140-179);
  * split head/tail wall-clock latency (mean±std) + COCO mAP with optional
    8/16-bit quantization (:182-252).
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnd_ghnd_tpu.codec.datalogger import DataLogger, binary_object_size_kb
from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.evals.coco_eval import CocoEvaluator
from hnd_ghnd_tpu.evals.postprocess import finalize_predictions
from hnd_ghnd_tpu.models.factory import get_iou_types, get_model
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.split.deploy import SplitRCNN
from hnd_ghnd_tpu.utils import ckpt as ckpt_util
from hnd_ghnd_tpu.utils.params import count_params

DATA_RATES_MBPS = [0.5 * i for i in range(1, 21)]  # 0.5 .. 10 Mbps


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Cost analyzer")
    common.add_common_args(parser)
    # the reference spells this one single-dash (src/cost_analyzer.py:26)
    parser.add_argument("-model_params", "--model_params",
                        action="store_true")
    parser.add_argument("--modules", nargs="+", default=None,
                        help="dotted module paths to count parameters for "
                             "(reference --modules, src/cost_analyzer.py:28)")
    # The three analysis selectors take a dataset split name like the
    # reference (src/cost_analyzer.py:29-33); bare flag = the test split
    # (backward compatible with the earlier store_true surface).
    parser.add_argument("--data_size", nargs="?", const="test", default=None,
                        help="dataset split name to analyze data size")
    parser.add_argument("--bottleneck_size", nargs="?", const="test",
                        default=None,
                        help="dataset split name to analyze bottleneck size")
    parser.add_argument("--split_model", nargs="?", const="test",
                        default=None,
                        help="dataset split name to measure split inference")
    parser.add_argument("--quantization", "--quantize", type=int, default=8,
                        help="wire bits for --split_model / --bottleneck_size"
                             " (8 or 16; <=0 disables)")
    parser.add_argument("-skip_tail", action="store_true",
                        help="skip measuring inference time for tail model "
                             "(reference -skip_tail)")
    parser.add_argument("--int8_tail", action="store_true",
                        help="with --split_model: also run the int8 server "
                             "tail (integer trunk weights+activations, "
                             "split/int8.py) and report its latency and "
                             "mAP delta vs the fp tail")
    parser.add_argument("--calib_images", type=int, default=8,
                        help="calibration images for --int8_tail")
    parser.add_argument("--max_images", type=int, default=None,
                        help="cap analyzed test images")
    parser.add_argument("-resized", action="store_true",
                        help="apply the detector resize rule before the "
                             "--data_size payload study (reference -resized)")
    return parser


def summarize_data_sizes(sizes_kb: List[float], label: str) -> None:
    arr = np.asarray([s for s in sizes_kb if s > 0])
    if not len(arr):
        print(f"{label}: no data")
        return
    print(f"{label}: mean {arr.mean():.2f} KB  std {arr.std():.2f}  "
          f"min {arr.min():.2f}  max {arr.max():.2f}")
    print("  comm delay over data rate [Mbps -> sec/image]:")
    row = "  ".join(f"{r:.1f}:{arr.mean() * 8 / (r * 1000):.3f}"
                    for r in DATA_RATES_MBPS)
    print("  " + row)


def analyze_model_params(model, params,
                         module_paths: Optional[List[str]] = None) -> None:
    print("parameter counts:")
    total = count_params(params)
    for module in ("backbone", "rpn", "roi_heads"):
        print(f"  {module}: {count_params(params[module]):,}")
    print(f"  total: {total:,}")
    if module_paths:
        # reference --modules table (src/cost_analyzer.py:44-53): per-path
        # parameter counts plus their sum; the params tree mirrors the
        # reference's torch module paths (backbone.body.layer1, ...)
        from hnd_ghnd_tpu.utils.params import get_by_path
        print("[Specified module(s)]")
        subtotal = 0
        for path in module_paths:
            n = count_params(get_by_path(params, path))
            subtotal += n
            print(f"  {path}: {n:,}")
        print(f"  Total # parameters: {subtotal:,}")
    if model.bottleneck is not None:
        from hnd_ghnd_tpu.split.deploy import (_split_head_params,
                                               _split_tail_params)
        n_head = count_params(_split_head_params(params))
        n_tail = count_params(_split_tail_params(params))
        print(f"  split head (edge): {n_head:,} ({100 * n_head / total:.2f}%)")
        print(f"  split tail (server): {n_tail:,}")


def summarize_tensor_shape(channels, heights, widths) -> None:
    """mean±std per tensor dim (reference summarize_tensor_shape,
    src/cost_analyzer.py:71-76)."""
    channels = np.asarray(channels, np.float64)
    heights = np.asarray(heights, np.float64)
    widths = np.asarray(widths, np.float64)
    print("Tensor shape")
    print(f"Channel:\t{channels.mean():.4f} ± {channels.std():.4f}")
    print(f"Height:\t{heights.mean():.4f} ± {heights.std():.4f}")
    print(f"Width:\t{widths.mean():.4f} ± {widths.std():.4f}")


def resize_for_rcnns(img, min_size: int = 800, max_size: int = 1333):
    """The detector transform's resize rule on a PIL image (reference
    resize_for_rcnns, src/cost_analyzer.py:79-86)."""
    from PIL import Image
    w, h = img.size
    img_min, img_max = float(min(w, h)), float(max(w, h))
    sf = min_size / img_min
    if img_max * sf > max_size:
        sf = max_size / img_max
    return img.resize((int(w * sf), int(h * sf)), resample=Image.BILINEAR)


def analyze_data_size(loader, max_images: Optional[int],
                      resized: bool = False) -> None:
    """Dataset payload study (reference analyze_data_size,
    src/cost_analyzer.py:89-137): per-image JPEG-95 re-encoded size, the
    jpeg_quality-compressed size list when the dataset sets one, min/max
    tensor shapes, per-dim mean±std — plus the raw file and decoded-tensor
    payloads (superset)."""
    import io

    from PIL import Image

    ds = loader.dataset
    org_sizes, comp_sizes, file_sizes, decoded_sizes = [], [], [], []
    chans, heights, widths = [], [], []
    min_shape = max_shape = None
    min_px = max_px = None
    for n, image_id in enumerate(ds.ids):
        if max_images and n >= max_images:
            break
        info = ds.images[image_id]
        path = os.path.join(ds.img_dir, info["file_name"])
        file_sizes.append(os.path.getsize(path) / 1024.0)
        img = Image.open(path).convert("RGB")
        if resized:
            img = resize_for_rcnns(img)
        w, h = img.size
        chans.append(3)
        heights.append(h)
        widths.append(w)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        org_sizes.append(buf.tell() / 1024.0)
        if ds.jpeg_quality is not None:
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=ds.jpeg_quality)
            comp_sizes.append(buf.tell() / 1024.0)
        decoded_sizes.append(binary_object_size_kb(
            np.asarray(img, dtype=np.uint8)))
        px = 3 * h * w
        if min_px is None or px < min_px:
            min_px, min_shape = px, [3, h, w]
        if max_px is None or px > max_px:
            max_px, max_shape = px, [3, h, w]
    summarize_data_sizes(org_sizes, "Original")
    print(f"Min tensor shape: {min_shape}")
    print(f"Max tensor shape: {max_shape}")
    if comp_sizes:
        summarize_data_sizes(comp_sizes,
                             f"JPEG quality = {ds.jpeg_quality}")
    summarize_tensor_shape(chans, heights, widths)
    summarize_data_sizes(file_sizes, "on-disk file payload")
    summarize_data_sizes(decoded_sizes, "decoded image payload")


def analyze_bottleneck_size(model, params, state, loader, quant_bits,
                            max_images: Optional[int]) -> None:
    # quantization disabled in the head: the logger itself derives the
    # fp16/int8 payloads from the raw fp32 bottleneck tensor (reference
    # DataLogger semantics, transformer.py:76-91)
    split = SplitRCNN(model, None)
    head_jit, _, _ = split.build(params, state)
    logger = DataLogger(num_bits=quant_bits if quant_bits > 0 else 8)
    seen = 0
    for batch, _, host in loader:
        for i, tgt in enumerate(host):
            if tgt.get("is_padding"):
                continue
            if max_images and seen >= max_images:
                break
            z, _, _, _ = head_jit(jnp.asarray(batch["images"][i:i + 1]))
            logger(np.asarray(z, dtype=np.float32))
            seen += 1
        if max_images and seen >= max_images:
            break
    fp32, fp16, q8, shapes = logger.get_data()
    summarize_data_sizes(fp32, "bottleneck fp32")
    summarize_data_sizes(fp16, "bottleneck fp16")
    summarize_data_sizes(q8, f"bottleneck int{logger.num_bits4quant}")
    if shapes:
        print(f"bottleneck tensor shape (C,H,W): {shapes[0]}")


def analyze_split_model_inference(model, params, state, loader, quant_bits,
                                  max_images: Optional[int],
                                  ext_threshold: Optional[float],
                                  int8_tail: bool = False,
                                  calib_images: int = 8,
                                  skip_tail: bool = False) -> None:
    split = SplitRCNN(model, quant_bits if quant_bits > 0 else None)
    head_jit, tail_call, _ = split.build(params, state)
    evaluator = CocoEvaluator(loader.dataset, get_iou_types(model))

    int8_call = None
    int8_evaluator = None
    int8_times: List[float] = []
    if int8_tail:
        # int8 server tail (split/int8.py): integer trunk weights +
        # activations, calibrated on the first images of the test split
        assert quant_bits == 8, "--int8_tail requires an 8-bit wire"
        from hnd_ghnd_tpu.split import int8 as qi
        calib: List[np.ndarray] = []
        for batch, _, host in loader:
            for i, tgt in enumerate(host):
                if tgt.get("is_padding") or len(calib) >= calib_images:
                    continue
                calib.append(np.asarray(batch["images"][i:i + 1]))
            if len(calib) >= calib_images:
                break
        scales = qi.calibrate_from_images(model, params, state, calib)
        print(f"int8 tail calibrated on {len(calib)} images "
              f"({len(scales)} activation sites)")
        int8_call = qi.Int8SplitTail(model, params, state, scales).build()
        int8_evaluator = CocoEvaluator(loader.dataset, get_iou_types(model))

    head_times, tail_times, wire_kb = [], [], []
    seen = 0
    for batch, _, host in loader:
        bucket = batch["images"].shape[1:3]
        for i, tgt in enumerate(host):
            if tgt.get("is_padding"):
                continue
            if max_images and seen >= max_images:
                break
            t0 = time.perf_counter()
            wire = split.run_edge(head_jit, batch["images"][i:i + 1],
                                  batch["image_sizes"][i:i + 1],
                                  batch["original_sizes"][i:i + 1],
                                  ext_threshold=ext_threshold)
            head_times.append(time.perf_counter() - t0)
            if wire is None:  # ext filter aborted: empty prediction
                empty = {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                         "labels": np.zeros(0, np.int64)}
                evaluator.update({tgt["image_id"]: dict(empty)})
                if int8_evaluator is not None:
                    int8_evaluator.update({tgt["image_id"]: dict(empty)})
                seen += 1
                continue
            wire_kb.append(len(wire) / 1024.0)
            if skip_tail:
                # reference -skip_tail (src/cost_analyzer.py:34, :104-113):
                # head latency + wire payload only
                seen += 1
                continue
            orig = tuple(tgt["original_size"])
            valid = (int(batch["image_sizes"][i][0]),
                     int(batch["image_sizes"][i][1]))
            t0 = time.perf_counter()
            dets = split.run_server(tail_call, wire, tuple(bucket))
            tail_times.append(time.perf_counter() - t0)
            evaluator.update({tgt["image_id"]: finalize_predictions(
                dets, 0, orig, valid)})
            if int8_call is not None:
                t0 = time.perf_counter()
                dets8 = split.run_server(int8_call, wire, tuple(bucket))
                int8_times.append(time.perf_counter() - t0)
                int8_evaluator.update({tgt["image_id"]: finalize_predictions(
                    dets8, 0, orig, valid)})
            seen += 1
        if max_images and seen >= max_images:
            break
    for name, times in (("head", head_times), ("tail", tail_times),
                        ("int8 tail", int8_times)):
        if times:
            # drop the first (compile) sample
            arr = np.asarray(times[1:] or times)
            print(f"{name} latency: {arr.mean() * 1000:.2f} ± "
                  f"{arr.std() * 1000:.2f} ms")
    summarize_data_sizes(wire_kb, "wire payload")
    if skip_tail:
        return
    evaluator.accumulate()
    stats = evaluator.summarize()
    if int8_evaluator is not None:
        print("int8 tail evaluation:")
        int8_evaluator.accumulate()
        stats8 = int8_evaluator.summarize()
        for t in stats:
            delta = float(stats8[t][0]) - float(stats[t][0])
            print(f"int8 tail mAP delta [{t}]: {delta:+.4f} "
                  f"(fp {float(stats[t][0]):.4f} -> "
                  f"int8 {float(stats8[t][0]):.4f})")


def main(args):
    config = overwrite_config(load_config(args.config), args.json)
    model_cfg = config.get("student_model", config.get("model"))
    model, params, state = get_model(model_cfg, seed=args.seed)
    if ckpt_util.check_if_exists(model_cfg.get("ckpt")):
        payload = ckpt_util.load_ckpt(model_cfg["ckpt"])
        params = payload["params"]
        state = payload["state"] or state
    loaders = dict(zip(("train", "val", "test"),
                       common.loaders_from_config(config, model.kind, 1)))

    def loader_for(split_name):
        if not isinstance(split_name, str):  # legacy boolean flag surface
            split_name = "test"
        if split_name not in loaders:
            raise SystemExit(f"unknown dataset split `{split_name}` "
                             f"(have: {sorted(loaders)})")
        return loaders[split_name]

    ext_threshold = (model_cfg["backbone"].get("ext_config") or {}).get(
        "threshold") if model.bottleneck and model.bottleneck.ext else None

    if args.model_params:
        analyze_model_params(model, params, getattr(args, "modules", None))
    if args.data_size:
        analyze_data_size(loader_for(args.data_size), args.max_images,
                          resized=getattr(args, "resized", False))
    if args.bottleneck_size:
        assert model.bottleneck is not None, "needs a bottleneck model"
        analyze_bottleneck_size(model, params, state,
                                loader_for(args.bottleneck_size),
                                args.quantization, args.max_images)
    if args.split_model:
        assert model.bottleneck is not None, "needs a bottleneck model"
        analyze_split_model_inference(model, params, state,
                                      loader_for(args.split_model),
                                      args.quantization, args.max_images,
                                      ext_threshold,
                                      int8_tail=getattr(args, "int8_tail",
                                                        False),
                                      calib_images=getattr(args,
                                                           "calib_images", 8),
                                      skip_tail=getattr(args, "skip_tail",
                                                        False))


def cli():
    main(get_argparser().parse_args())


if __name__ == "__main__":
    cli()
