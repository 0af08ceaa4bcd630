"""torch checkpoint -> JAX pytree weight conversion.

The reference initializes its teachers from torchvision zoo checkpoints
(src/models/org/rcnn.py:372-379, :444-450) and its students from the same
weights non-strictly (custom layer1 stays random).  This module converts any
such torch ``state_dict`` (from the zoo files or from reference-trained
student/ext checkpoints) into this framework's param/state pytrees:

  * conv OIHW -> HWIO; transposed-conv (I,O,kh,kw) -> (kh,kw,I,O);
  * linear [out,in] -> [in,out] (activations are flattened channel-major
    before linears precisely so these transposes suffice);
  * FrozenBatchNorm buffers fold into (scale, bias) with eps=0
    (torchvision 0.4.2 semantics);
  * bottleneck/ext BatchNorms keep (gamma, beta) params + running stats.

Non-strict merge: keys present in the state_dict update the pytree; missing
ones keep their current values — mirroring ``load_state_dict(strict=False)``.
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from hnd_ghnd_tpu.models import layers as L

logger = logging.getLogger(__name__)

ZOO_FILE_PREFIXES = {
    "faster_rcnn": "fasterrcnn_resnet50_fpn_coco",
    "mask_rcnn": "maskrcnn_resnet50_fpn_coco",
    "keypoint_rcnn": "keypointrcnn_resnet50_fpn_coco",
}

# torch Sequential index -> our param name, for the bottleneck stacks
_ENC_IDX = {"0": "conv0", "1": "bn0", "2": "conv1", "3": "bn1",
            "5": "conv2", "6": "bn2", "7": "conv3"}
_DEC_IDX = {"0": "bn_in", "2": "conv0", "3": "bn0", "4": "conv1",
            "5": "bn1", "7": "conv2", "8": "bn2", "9": "conv3", "10": "bn3"}
_EXT_IDX = {"1": "conv0", "2": "bn0", "4": "conv1", "5": "bn1",
            "7": "conv2", "8": "bn2"}

_TRANSPOSED_CONV_KEYS = ("conv5_mask", "kps_score_lowres")


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _collect_bns(sd: Dict[str, np.ndarray]):
    """Group state_dict keys into {prefix: {weight, bias, mean, var}}."""
    bns: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"^(.*)\.(weight|bias|running_mean|running_var)$", k)
        if not m:
            continue
        bns.setdefault(m.group(1), {})[m.group(2)] = v
    return {p: d for p, d in bns.items()
            if "running_mean" in d and "running_var" in d}


def torch_path_to_ours(path: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map a torch module path to (our pytree path, kind).

    kind in {conv, convT, linear, bn}; returns None for unknown paths.
    """
    parts = path.split(".")

    # strip DataParallel-style prefixes
    if parts[0] == "module":
        parts = parts[1:]

    p = ".".join(parts)

    # --- bottleneck encoder/decoder/ext inside layer1 -----------------------
    m = re.match(r"^backbone\.body\.layer1\.encoder\.encoder\.(\d+)$", p)
    if m and m.group(1) in _ENC_IDX:
        name = _ENC_IDX[m.group(1)]
        kind = "bn" if name.startswith("bn") else "conv"
        return ("backbone", "body", "layer1", "encoder", name), kind
    m = re.match(r"^backbone\.body\.layer1\.decoder\.(\d+)$", p)
    if m and m.group(1) in _DEC_IDX:
        name = _DEC_IDX[m.group(1)]
        kind = "bn" if name.startswith("bn") else "conv"
        return ("backbone", "body", "layer1", "decoder", name), kind
    m = re.match(r"^backbone\.body\.layer1\.encoder\.ext_classifier\.extractor\.(\d+)$", p)
    if m and m.group(1) in _EXT_IDX:
        name = _EXT_IDX[m.group(1)]
        kind = "bn" if name.startswith("bn") else "conv"
        return ("backbone", "body", "layer1", "ext_classifier", name), kind
    if p == "backbone.body.layer1.encoder.ext_classifier.linear":
        return ("backbone", "body", "layer1", "ext_classifier", "linear"), "linear"

    # --- resnet trunk --------------------------------------------------------
    m = re.match(r"^backbone\.body\.(conv1|bn1)$", p)
    if m:
        kind = "bn" if m.group(1) == "bn1" else "conv"
        return ("backbone", "body", m.group(1)), kind
    m = re.match(r"^backbone\.body\.(layer\d)\.(\d+)\.(conv\d|bn\d)$", p)
    if m:
        kind = "bn" if m.group(3).startswith("bn") else "conv"
        return ("backbone", "body", m.group(1), m.group(2), m.group(3)), kind
    m = re.match(r"^backbone\.body\.(layer\d)\.(\d+)\.downsample\.([01])$", p)
    if m:
        kind = "bn" if m.group(3) == "1" else "conv"
        return ("backbone", "body", m.group(1), m.group(2), "downsample",
                m.group(3)), kind

    # --- fpn -----------------------------------------------------------------
    m = re.match(r"^backbone\.fpn\.(inner_blocks|layer_blocks)\.(\d+)$", p)
    if m:
        return ("backbone", "fpn", m.group(1), m.group(2)), "conv"

    # --- rpn -----------------------------------------------------------------
    m = re.match(r"^rpn\.head\.(conv|cls_logits|bbox_pred)$", p)
    if m:
        return ("rpn", "head", m.group(1)), "conv"

    # --- roi heads -----------------------------------------------------------
    m = re.match(r"^roi_heads\.box_head\.(fc6|fc7)$", p)
    if m:
        return ("roi_heads", "box_head", m.group(1)), "linear"
    m = re.match(r"^roi_heads\.box_predictor\.(cls_score|bbox_pred)$", p)
    if m:
        return ("roi_heads", "box_predictor", m.group(1)), "linear"
    m = re.match(r"^roi_heads\.mask_head\.(mask_fcn\d)$", p)
    if m:
        return ("roi_heads", "mask_head", m.group(1)), "conv"
    m = re.match(r"^roi_heads\.mask_predictor\.(conv5_mask|mask_fcn_logits)$", p)
    if m:
        kind = "convT" if m.group(1) == "conv5_mask" else "conv"
        return ("roi_heads", "mask_head", m.group(1)), kind
    m = re.match(r"^roi_heads\.keypoint_head\.(\d+)$", p)
    if m:
        idx = int(m.group(1))
        if idx % 2 == 0:  # convs at even Sequential slots, ReLUs at odd
            return ("roi_heads", "keypoint_head", str(idx // 2)), "conv"
        return None
    if p == "roi_heads.keypoint_predictor.kps_score_lowres":
        return ("roi_heads", "keypoint_head", "kps_score_lowres"), "convT"

    return None


def convert_state_dict(sd: Dict[str, np.ndarray]):
    """Convert a torch state_dict (tensors or ndarrays) into
    (param_updates, state_updates) nested dicts."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    bns = _collect_bns(sd)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    consumed = set()

    for prefix, bufs in bns.items():
        mapping = torch_path_to_ours(prefix)
        if mapping is None:
            logger.debug("skipping unknown BN %s", prefix)
            continue
        path, kind = mapping
        is_trainable_bn = (
            "layer1" in path and ("encoder" in path or "decoder" in path
                                  or "ext_classifier" in path))
        w = bufs.get("weight", np.ones_like(bufs["running_mean"]))
        b = bufs.get("bias", np.zeros_like(bufs["running_mean"]))
        if is_trainable_bn:
            _set(params, path, {"gamma": w.astype(np.float32),
                                "beta": b.astype(np.float32)})
            _set(state, path, {"mean": bufs["running_mean"].astype(np.float32),
                               "var": bufs["running_var"].astype(np.float32)})
        else:
            folded = L.fold_bn_stats(w, b, bufs["running_mean"],
                                     bufs["running_var"], eps=0.0)
            _set(params, path, {"scale": np.asarray(folded["scale"]),
                                "bias": np.asarray(folded["bias"])})
        for suffix in ("weight", "bias", "running_mean", "running_var",
                       "num_batches_tracked"):
            consumed.add(f"{prefix}.{suffix}")

    for key, val in sd.items():
        if key in consumed or key.endswith("num_batches_tracked"):
            continue
        m = re.match(r"^(.*)\.(weight|bias)$", key)
        if not m:
            continue
        prefix, leaf = m.group(1), m.group(2)
        mapping = torch_path_to_ours(prefix)
        if mapping is None:
            logger.debug("skipping unknown key %s", key)
            continue
        path, kind = mapping
        if leaf == "bias":
            _set(params, path + ("b",), val.astype(np.float32))
            continue
        if kind == "linear":
            _set(params, path + ("w",), val.T.astype(np.float32))
        elif kind == "convT":
            _set(params, path + ("w",), val.transpose(2, 3, 0, 1).astype(np.float32))
        else:
            _set(params, path + ("w",), val.transpose(2, 3, 1, 0).astype(np.float32))

    return params, state


def merge_pytree(base, updates, path=""):
    """Non-strict recursive merge (load_state_dict(strict=False) analog).
    Shape mismatches are skipped with a warning (e.g. class-count changes)."""
    if updates is None:
        return base
    if isinstance(base, dict):
        out = dict(base)
        for k, v in updates.items():
            if k in out:
                out[k] = merge_pytree(out[k], v, f"{path}.{k}")
            else:
                logger.debug("ckpt key %s.%s not in model; skipped", path, k)
        return out
    if hasattr(base, "shape") and hasattr(updates, "shape") \
            and tuple(base.shape) != tuple(updates.shape):
        logger.warning("shape mismatch at %s: model %s vs ckpt %s; kept model",
                       path, base.shape, updates.shape)
        return base
    return updates


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "model" in obj and not any(
            "." in k for k in obj.keys()):
        obj = obj["model"]
    return obj


def maybe_load_pretrained(model, params, state, model_config,
                          pretrained_dir: Optional[str] = None):
    """Look for a converted zoo / torch checkpoint for this model and merge
    it.  Search order: explicit ``pretrained_dir``, ./resource/ckpt/torchzoo."""
    dirs = [d for d in [pretrained_dir, "./resource/ckpt/torchzoo"] if d]
    prefix = ZOO_FILE_PREFIXES.get(model.kind)
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            if prefix and fname.startswith(prefix) and fname.endswith((".pth", ".pt")):
                sd = load_torch_file(os.path.join(d, fname))
                p_up, s_up = convert_state_dict(sd)
                logger.info("loaded pretrained weights from %s", fname)
                return (merge_pytree(params, p_up),
                        merge_pytree(state, s_up))
    return None
