"""Pure-numpy oracles for detector primitives, written straight from the
published algorithm definitions (greedy NMS; Detectron/torchvision-style
RoIAlign).  These are the ground truth the fixed-shape TPU formulations in
``hnd_ghnd_tpu.ops`` are tested against."""
from __future__ import annotations

import numpy as np


def iou_matrix(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    out = np.zeros_like(inter)
    np.divide(inter, union, out=out, where=union > 0)
    return out


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Sequential greedy NMS; returns kept indices in descending score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    iou = iou_matrix(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = False  # a box never suppresses itself
    return np.array(keep, dtype=np.int64)


def roi_align_one_level(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
                        out_size: int, sampling_ratio: int) -> np.ndarray:
    """RoIAlign on one [H, W, C] feature map, torchvision 0.4.2 semantics
    (legacy non-aligned offsets)."""
    h, w, c = feat.shape
    n = rois.shape[0]
    out = np.zeros((n, out_size, out_size, c), dtype=np.float64)
    for r in range(n):
        x1, y1, x2, y2 = rois[r] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(c)
                for iy in range(sampling_ratio):
                    y = y1 + ph * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                    for ix in range(sampling_ratio):
                        x = x1 + pw * bin_w + (ix + 0.5) * bin_w / sampling_ratio
                        acc += _bilinear(feat, y, x, h, w)
                out[r, ph, pw] = acc / (sampling_ratio * sampling_ratio)
    return out.astype(np.float32)


def _bilinear(feat, y, x, h, w):
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_lo = int(np.floor(y))
    x_lo = int(np.floor(x))
    if y_lo >= h - 1:
        y_hi = y_lo = h - 1
        y = float(y_lo)
    else:
        y_hi = y_lo + 1
    if x_lo >= w - 1:
        x_hi = x_lo = w - 1
        x = float(x_lo)
    else:
        x_hi = x_lo + 1
    ly = y - y_lo
    lx = x - x_lo
    return ((1 - ly) * (1 - lx) * feat[y_lo, x_lo]
            + (1 - ly) * lx * feat[y_lo, x_hi]
            + ly * (1 - lx) * feat[y_hi, x_lo]
            + ly * lx * feat[y_hi, x_hi])


def quantize_tensor(x: np.ndarray, num_bits: int = 8):
    """Affine uint quantization with the exact arithmetic the reference's
    myutils ``tensor_util.quantize_tensor`` performs (gemmlowp-style: scale
    from min/max, integer zero point clamped to the quant range).  All
    arithmetic in float32 — the reference operates on f32 torch tensors."""
    qmin = np.float32(0.0)
    qmax = np.float32(2.0 ** num_bits - 1.0)
    min_val = x.astype(np.float32).min()
    max_val = x.astype(np.float32).max()
    scale = np.float32((max_val - min_val) / (qmax - qmin))
    initial_zero_point = np.float32(qmin - min_val / scale)
    zero_point = int(np.clip(initial_zero_point, qmin, qmax))
    qx = np.clip(np.float32(zero_point) + x.astype(np.float32) / scale,
                 qmin, qmax).round()
    return qx.astype(np.uint8), np.float32(scale), zero_point


def dequantize_tensor(qx: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    return (scale * (qx.astype(np.float32) - zero_point)).astype(np.float32)
