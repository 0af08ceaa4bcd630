"""Config-driven model construction (the reference YAML schema, unchanged).

Parity surface: src/models/__init__.py:38-57 (``get_model``) +
src/models/org/rcnn.py:423-451 — teacher = stock resnet50 trunk, student =
custom_resnet50 with the Bottleneck4LargeResNet injected into layer1, an
optional ext filter, an optional quantize/dequantize bottleneck transformer,
and iou_types derived from the model class (models/__init__.py:60-70).

The ``pretrained`` flag maps to loading a converted torchvision zoo
checkpoint when one is available on disk (models/convert.py); this
environment has no network egress, so absent weights fall back to random
init with a warning rather than downloading.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax

from hnd_ghnd_tpu.models.bottleneck import Bottleneck4LargeResNet
from hnd_ghnd_tpu.models.rcnn import RCNN

logger = logging.getLogger(__name__)

KNOWN_KINDS = ("faster_rcnn", "mask_rcnn", "keypoint_rcnn")
BOTTLENECK_NAMES = {"Bottleneck4LargeResNet", "Bottleneck4SmallResNet"}


def _quant_bits_from_transformer(cfg: Optional[dict]) -> Optional[int]:
    if not cfg:
        return None
    comp = cfg.get("components", {})
    q = comp.get("quantizer", {}).get("params", {})
    return int(q.get("num_bits", 8))


def build_model(model_config: Dict[str, Any]) -> RCNN:
    """Build an RCNN from a reference-schema model config block
    (``teacher_model`` / ``student_model`` / ``model``)."""
    kind = model_config["name"]
    if kind not in KNOWN_KINDS:
        raise KeyError(f"model name `{kind}` is not expected")
    backbone_cfg = model_config["backbone"]
    backbone_name = backbone_cfg["name"]
    params_cfg = model_config.get("params", {}) or {}
    num_classes = int(params_cfg.get("num_classes", 91))
    num_keypoints = int(params_cfg.get("num_keypoints", 17))

    bottleneck = None
    ext_threshold = None
    layer1_cfg = (backbone_cfg.get("params", {}) or {}).get("layer1")
    if layer1_cfg is not None:
        name = layer1_cfg["name"]
        if name not in BOTTLENECK_NAMES:
            raise ValueError(f"layer1 name `{name}` is not expected")
        # The reference factory instantiates the Large variant regardless of
        # the Small name (resnet_layer.py:80-81) — preserved behavior.
        ext_config = backbone_cfg.get("ext_config")
        transformer_cfg = model_config.get("bottleneck_transformer")
        quant_bits = _quant_bits_from_transformer(transformer_cfg)
        # JPEG-bearing chains run host-side through pure_callback; pure
        # quantize/dequantize chains stay on the jit-native fused path
        from hnd_ghnd_tpu.codec.quantizer import get_bottleneck_transformer
        chain = get_bottleneck_transformer(transformer_cfg)
        host_transformer = chain if (chain is not None
                                     and chain.host_side) else None
        bottleneck = Bottleneck4LargeResNet(
            int(layer1_cfg["bottleneck_channel"]), ext_config,
            quant_bits=quant_bits, host_transformer=host_transformer)
        if ext_config is not None:
            ext_threshold = float(ext_config.get("threshold", 0.01))

    return RCNN(kind=kind, backbone_name=backbone_name,
                num_classes=num_classes, bottleneck=bottleneck,
                num_keypoints=num_keypoints, ext_threshold=ext_threshold,
                # eval-only int8 RoI pooling table (BASELINE.md round-3
                # eval attribution: the gather is the bandwidth floor)
                int8_roi_pool=bool(params_cfg.get("int8_roi_pool", False)),
                # eval-path RoIAlign program: "pallas" = window-DMA kernel
                # (ops/pallas_roi.py), "xla" = row-gather program
                roi_pool_impl=str(params_cfg.get("roi_pool_impl", "auto")),
                # keypoint heatmap decode: "host" (torchvision-exact) or
                # "device" (static-grid argmax on the same cubic surface,
                # ops/kp_decode.py; BASELINE.md round-5 exactness numbers)
                kp_decode=str(params_cfg.get("kp_decode", "host")),
                kp_decode_grid=int(params_cfg.get("kp_decode_grid", 224)))


def init_model(model: RCNN, seed: int = 0):
    return model.init(jax.random.PRNGKey(seed))


def _load_ckpt_into(params, state, path: str):
    """Load a checkpoint file into (params, state) — our pickle format or a
    torch state_dict (converted).  Non-strict merge, like the reference's
    load_ckpt(strict=False) path."""
    from hnd_ghnd_tpu.models.convert import (convert_state_dict,
                                             load_torch_file, merge_pytree)
    from hnd_ghnd_tpu.utils import ckpt as ckpt_util
    try:
        payload = ckpt_util.load_ckpt(path)
        if isinstance(payload, dict) and "format_version" in payload:
            params = merge_pytree(params, payload.get("params"))
            if payload.get("state") is not None:
                state = merge_pytree(state, payload["state"])
            logger.info("loaded checkpoint %s", path)
            return params, state
    except Exception:
        pass
    try:
        sd = load_torch_file(path)
        p_up, s_up = convert_state_dict(sd)
        logger.info("loaded converted torch checkpoint %s", path)
        return merge_pytree(params, p_up), merge_pytree(state, s_up)
    except Exception as e:
        logger.warning("could not load checkpoint %s: %s", path, e)
        return params, state


def get_model(model_config: Dict[str, Any], seed: int = 0,
              pretrained_dir: Optional[str] = None):
    """Build + initialize (+ optionally load converted zoo weights and the
    config's checkpoints).

    Mirrors the reference construction order (src/models/__init__.py:38-57):
    zoo weights (``pretrained``), then the ext classifier's ckpt, then the
    model's own ckpt — each loaded only if present on disk.
    Returns (model, params, state).
    """
    from hnd_ghnd_tpu.utils.ckpt import check_if_exists

    model = build_model(model_config)
    params, state = init_model(model, seed)
    if (model_config.get("params", {}) or {}).get("pretrained"):
        from hnd_ghnd_tpu.models.convert import maybe_load_pretrained
        loaded = maybe_load_pretrained(model, params, state,
                                       model_config, pretrained_dir)
        if loaded is not None:
            params, state = loaded
        else:
            logger.warning(
                "pretrained=True but no converted checkpoint found "
                "(zero-egress environment); using random init")
    ext_ckpt = ((model_config.get("backbone", {}).get("ext_config") or {})
                .get("ckpt"))
    if check_if_exists(ext_ckpt):
        params, state = _load_ckpt_into(params, state, ext_ckpt)
    if check_if_exists(model_config.get("ckpt")):
        params, state = _load_ckpt_into(params, state, model_config["ckpt"])
    return model, params, state


def get_iou_types(model: RCNN):
    """Eval IoU types per model class (reference models/__init__.py:60-70)."""
    iou_types = ["bbox"]
    if model.kind == "mask_rcnn":
        iou_types.append("segm")
    elif model.kind == "keypoint_rcnn":
        iou_types.append("keypoints")
    return iou_types
