"""Multi-scale RoIAlign as a fixed-shape XLA gather program.

Replaces torchvision's C++/CUDA ``roi_align`` + ``MultiScaleRoIAlign``
(reference use: box head 7x7, mask/keypoint heads 14x14, sampling_ratio=2,
FPN levels P2..P5 — src/models/org/rcnn.py:196-199, :261-265, :334-338).

TPU formulation
---------------
Why an XLA gather and not a hand-written Pallas kernel: RoIAlign reads ~4
corner vectors per sample point — for 1000 RoIs x 7x7 bins x 2x2 samples
that is ~200MB of gather traffic at C=256.  A DMA-stripe Pallas kernel must
fetch a conservatively-sized window per RoI (level assignment bounds RoIs to
28-56 feature rows, so a 64x64xC window ~ 4MB), i.e. ~4GB of HBM traffic for
the same work — 20x worse.  The gather IS the bandwidth-optimal program, and
XLA's TPU gather lowering is efficient for contiguous [*, C] rows, so this op
stays in XLA by design.

All FPN levels are flattened and concatenated into one [sum(Hl*Wl), C] table.
Each RoI picks its level with the canonical FPN heuristic
(floor(4 + log2(sqrt(area)/224 + eps)), clamped to [2, 5]) which becomes a
per-RoI base offset into the table — so the whole op is 4 big gathers (one
per bilinear corner) + weighted sums, with no data-dependent shapes and no
per-level ragged dispatch.  Interpolation semantics replicate torchvision
0.4.2 exactly (legacy non-aligned offsets, roi size clamped to >= 1, border
rules: sample points outside [-1, size] contribute 0, then clamped to
[0, size-1]).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CANONICAL_SCALE = 224.0
CANONICAL_LEVEL = 4
LVL_MIN = 2
LVL_MAX = 5


def assign_levels(boxes: jnp.ndarray) -> jnp.ndarray:
    """FPN level index (0-based: level k -> k - LVL_MIN) per RoI [N]."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    scale = jnp.sqrt(jnp.clip(w * h, 0.0))
    k = jnp.floor(CANONICAL_LEVEL + jnp.log2(scale / CANONICAL_SCALE + 1e-6))
    k = jnp.clip(k, LVL_MIN, LVL_MAX)
    return (k - LVL_MIN).astype(jnp.int32)


def _bilinear_params(coord: jnp.ndarray, size: jnp.ndarray):
    """torchvision-exact bilinear setup along one axis.

    coord: sample coordinates [...]; size: feature extent (scalar or per-row).
    Returns (low_idx, high_idx, low_weight, high_weight, in_range_mask).
    """
    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.clip(coord, 0.0)
    low = jnp.floor(c)
    # if low >= size - 1: low = high = size - 1, coord snapped
    snap = low >= size - 1.0
    low = jnp.where(snap, size - 1.0, low)
    c = jnp.where(snap, low, c)
    high = jnp.where(snap, low, low + 1.0)
    l_frac = c - low
    return (low.astype(jnp.int32), high.astype(jnp.int32),
            1.0 - l_frac, l_frac, in_range)


def _level_geometry(features: Sequence[jnp.ndarray],
                    image_size: Tuple[int, int]):
    """Static per-level geometry arrays (feature shapes are trace-time
    constants on static buckets)."""
    heights = np.array([f.shape[-3] for f in features], dtype=np.float32)
    widths = np.array([f.shape[-2] for f in features], dtype=np.float32)
    # torchvision infers scales as 2^round(log2(feat/img)) — exact powers of
    # two for stride-aligned buckets.
    scales = np.array(
        [2.0 ** np.round(np.log2(f.shape[-3] / float(image_size[0])))
         for f in features], dtype=np.float32)
    offsets = np.concatenate(
        [[0], np.cumsum([f.shape[-3] * f.shape[-2] for f in features])]
    )[:len(features)].astype(np.int32)
    return heights, widths, scales, offsets


def _roi_align_flat(table: jnp.ndarray, geometry, boxes: jnp.ndarray,
                    row_offset: jnp.ndarray | None, output_size: int,
                    sampling_ratio: int,
                    table_scale: jnp.ndarray | None = None,
                    out_dtype=None) -> jnp.ndarray:
    """Core fixed-shape RoIAlign: one big 4-corner gather over a flattened
    [rows, C] feature table.

    boxes: [M, 4]; row_offset: optional extra per-RoI base row (the image
    offset when the table concatenates a whole batch).  Returns
    [M, out, out, C].

    ``table_scale``: when the table is int8-quantized (per-level symmetric),
    the [L] dequantization scales — folded into the bilinear weights, so the
    int8 path costs no extra passes (see multiscale_roi_align_batch).
    """
    heights, widths, scales, offsets = geometry
    c = table.shape[-1]
    dtype = out_dtype if out_dtype is not None else table.dtype

    lvl = assign_levels(boxes)  # [M]
    lvl_scale = jnp.asarray(scales)[lvl]
    lvl_h = jnp.asarray(heights)[lvl]
    lvl_w = jnp.asarray(widths)[lvl]
    lvl_off = jnp.asarray(offsets)[lvl]
    if row_offset is not None:
        lvl_off = lvl_off + row_offset

    # RoI in feature coordinates (legacy non-aligned: no -0.5 offset).
    x1 = boxes[:, 0] * lvl_scale
    y1 = boxes[:, 1] * lvl_scale
    x2 = boxes[:, 2] * lvl_scale
    y2 = boxes[:, 3] * lvl_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size  # [M]
    bin_h = roi_h / output_size

    s = sampling_ratio
    # Sample-point coordinates: [M, P, S] for P = output bins, S = samples/bin.
    bins = jnp.arange(output_size, dtype=jnp.float32)
    samp = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = (y1[:, None, None]
          + bins[None, :, None] * bin_h[:, None, None]
          + samp[None, None, :] * bin_h[:, None, None])  # [M, out, s]
    xs = (x1[:, None, None]
          + bins[None, :, None] * bin_w[:, None, None]
          + samp[None, None, :] * bin_w[:, None, None])

    y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(ys, lvl_h[:, None, None])
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(xs, lvl_w[:, None, None])

    # Accumulate straight into the [M, out, out, C] bin accumulator, one
    # gather per (bilinear corner x sample position): 4 * s^2 gathers of
    # [M * out^2] rows.  Bytes gathered are identical to the expanded
    # [M, out, s, out, s] formulation, but no 5-D intermediate (s^2 x the
    # output size) is ever materialized or re-read by a final reduction
    # (v5e eval path: RoI stage 87 -> 81 ms at 8x1000 RoIs; raw-gather
    # floor for these bytes is ~47 ms, so the op runs within ~1.7x of the
    # measured XLA gather bandwidth ceiling).
    ok_y = y_ok.astype(jnp.float32)
    ok_x = x_ok.astype(jnp.float32)
    inv = 1.0 / float(s * s)
    if table_scale is not None:
        # fold the per-RoI dequant scale into the sample-mean factor
        deq = jnp.asarray(table_scale, jnp.float32)[lvl]  # [M]
        inv = inv * deq[:, None, None]
    w_stride = lvl_w.astype(jnp.int32)[:, None, None]
    base2 = lvl_off[:, None, None]

    out = None
    for sy in range(s):
        for sx in range(s):
            for (yi, wy) in ((y_lo, wy_lo), (y_hi, wy_hi)):
                for (xi, wx) in ((x_lo, wx_lo), (x_hi, wx_hi)):
                    # [M, out] slices for this sample position
                    yi_s, wy_s, oky = yi[..., sy], wy[..., sy], ok_y[..., sy]
                    xi_s, wx_s, okx = xi[..., sx], wx[..., sx], ok_x[..., sx]
                    idx = (base2 + yi_s[:, :, None] * w_stride
                           + xi_s[:, None, :])  # [M, out, out]
                    vals = jnp.take(table, idx.reshape(-1), axis=0)
                    vals = vals.reshape(idx.shape + (c,)).astype(dtype)
                    w = ((wy_s * oky)[:, :, None]
                         * (wx_s * okx)[:, None, :] * inv)
                    contrib = vals * w.astype(dtype)[..., None]
                    out = contrib if out is None else out + contrib
    return out  # [M, out, out, C] (sample mean folded into the weights)


def multiscale_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    output_size: int,
    sampling_ratio: int = 2,
    boxes_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """RoIAlign over FPN levels for one image.

    features: list of [Hl, Wl, C] arrays for P2..P5 (strides 4/8/16/32).
    boxes: [N, 4] in padded-image coordinates. image_size: padded (H, W).
    Returns [N, output_size, output_size, C].
    """
    c = features[0].shape[-1]
    geometry = _level_geometry(features, image_size)
    table = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    out = _roi_align_flat(table, geometry, boxes, None, output_size,
                          sampling_ratio)
    if boxes_valid is not None:
        out = out * boxes_valid.astype(out.dtype)[:, None, None, None]
    return out


def quantize_fpn_levels(features: Sequence[jnp.ndarray]):
    """Symmetric per-level int8 quantization of FPN feature maps.

    Returns ``(qfeats, level_scales)`` suitable for
    ``multiscale_roi_align_batch(..., quant=(qfeats, level_scales))`` —
    callers pooling the same levels more than once per step (box + mask +
    keypoint heads) quantize once and share the tables instead of paying a
    full feature-map pass per pooling call.
    """
    qfeats, lvl_scales = [], []
    for f in features:
        amax = jnp.max(jnp.abs(f.astype(jnp.float32)))
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        qfeats.append(jnp.clip(jnp.round(f.astype(jnp.float32) / s),
                               -127, 127).astype(jnp.int8))
        lvl_scales.append(s)
    return qfeats, jnp.stack(lvl_scales)


def multiscale_roi_align_batch(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    output_size: int,
    sampling_ratio: int = 2,
    boxes_valid: jnp.ndarray | None = None,
    quant: str | tuple | None = None,
) -> jnp.ndarray:
    """Batched RoIAlign: features [B, Hl, Wl, C] per level, boxes [B, N, 4].

    One flat gather over the whole batch's concatenated feature table
    (per-image base offsets) instead of a vmapped per-image gather — on TPU
    a single large gather pipelines ~1.5x better and the downstream heads
    see one [B*N, ...] matmul instead of B small ones.  (A quad-row table
    packing all 4 bilinear corners into one 4C-wide fetch measured 1.4x
    faster in a gather microbenchmark but is throughput-neutral in the
    full program — the corner-reduce traffic eats the gain — so the
    simpler per-corner accumulation stays.)
    """
    b, n = boxes.shape[:2]
    c = features[0].shape[-1]
    out_dtype = features[0].dtype
    geometry = _level_geometry(features, image_size)
    table_scale = None
    if quant == "int8":
        # Opt-in eval-only lever (config model params `int8_roi_pool`):
        # quantize each level symmetrically to int8 (one streamed pass),
        # halving the gather bytes of the eval-path bottleneck (the XLA
        # row-gather floor, BASELINE.md round-3 attribution).  The per-level
        # dequant scale folds into the bilinear weights for free.
        features, table_scale = quantize_fpn_levels(features)
    elif isinstance(quant, tuple):
        # prequantized (qfeats, level_scales) from quantize_fpn_levels —
        # shared across the box/mask/keypoint pooling calls of one step
        features, table_scale = quant
    elif quant is not None:
        raise ValueError(f"unknown roi-pool quant mode `{quant}`")
    # [B, HW, C] -> [B*HW, C]; per-image rows offset by i*HW
    tables = jnp.concatenate(
        [f.reshape(b, -1, c) for f in features], axis=1)
    hw = tables.shape[1]
    table = tables.reshape(b * hw, c)
    flat_boxes = boxes.reshape(-1, 4)
    img_off = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * hw, n)
    out = _roi_align_flat(table, geometry, flat_boxes, img_off, output_size,
                          sampling_ratio, table_scale=table_scale,
                          out_dtype=out_dtype)
    out = out.reshape(b, n, output_size, output_size, c)
    if boxes_valid is not None:
        out = out * boxes_valid.astype(out.dtype)[:, :, None, None, None]
    return out
