"""Box primitives: IoU, affine box coding, clipping — fixed-shape jnp.

Behavioral parity targets (semantics, not code) are torchvision 0.4.2's
``ops.boxes`` / ``models.detection._utils.BoxCoder`` as consumed by the
reference R-CNNs (reference: src/models/org/rcnn.py:6-17 imports them; the
split model re-uses the same coder, src/models/mimic/split_rcnn.py:146).

Boxes are ``[..., 4]`` in (x1, y1, x2, y2) corner format, float32.
Everything here is shape-polymorphic but *static* under jit: no
data-dependent shapes; invalid boxes are handled by masks, never by
filtering.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# torchvision BoxCoder clamp: log(1000 / 16)
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes; negative extents clamp to zero width/height."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between two box sets.

    boxes1: [N, 4], boxes2: [M, 4] -> [N, M] float32.
    Matches torchvision ``box_iou`` semantics (zero-area union -> 0 via the
    intersection clamp; degenerate boxes yield iou 0 against everything as
    long as the union is positive).
    """
    a1 = area(boxes1)  # [N]
    a2 = area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
           weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode target ``reference_boxes`` relative to ``proposals`` (anchors).

    Returns [..., 4] regression deltas (dx, dy, dw, dh) with the standard
    R-CNN parameterization.
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    # Guard degenerate proposals (padding) against div-by-zero / log(0);
    # padded rows are masked out downstream.
    safe_w = jnp.where(ex_w > 0, ex_w, 1.0)
    safe_h = jnp.where(ex_h > 0, ex_h, 1.0)
    safe_gw = jnp.where(gt_w > 0, gt_w, 1.0)
    safe_gh = jnp.where(gt_h > 0, gt_h, 1.0)

    dx = wx * (gt_cx - ex_cx) / safe_w
    dy = wy * (gt_cy - ex_cy) / safe_h
    dw = ww * jnp.log(safe_gw / safe_w)
    dh = wh * jnp.log(safe_gh / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode(deltas: jnp.ndarray, boxes: jnp.ndarray,
           weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply regression ``deltas`` [..., 4] to ``boxes`` [..., 4].

    dw/dh are clamped at log(1000/16) exactly like torchvision's BoxCoder.
    """
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w
    y2 = pred_cy + 0.5 * pred_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def clip_to_image(boxes: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Clip boxes to [0, W] x [0, H].

    image_size: [..., 2] as (height, width) — broadcastable against the box
    batch dims (a [2] vector for a single image, [B, 1, 2] for a batch of box
    sets).
    """
    h = image_size[..., 0].astype(boxes.dtype)
    w = image_size[..., 1].astype(boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes whose width AND height are >= min_size.

    Replaces torchvision's ``remove_small_boxes`` (which returns indices and
    therefore a dynamic shape) with a mask — downstream consumers multiply
    scores by the mask instead of gathering.
    """
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)
