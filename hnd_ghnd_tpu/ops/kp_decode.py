"""Device-side keypoint heatmap decode (VERDICT r4 #6 experiment).

The reference decodes keypoints on host inside torchvision
(heatmaps_to_keypoints via /root/reference/src/models/org/rcnn.py:334-345):
each detection's 56x56 heatmap is bicubic-resized to the box's OWN pixel
size (rw x rh, data-dependent), argmax'd, and the grid index mapped to image
coordinates.  That per-box dynamic resize is why the rebuild's exact decode
lives on host (evals/postprocess.py) — measured at 561 ms/batch-8 at 100
valid detections/image vs a 101 ms device step (BASELINE.md round-4).

This module implements the device-side formulation: the SAME continuous
bicubic surface (cv2 INTER_CUBIC, a=-0.75, border-replicate taps), sampled
on a STATIC GxG grid via two MXU matmuls, then argmax.  The geometry is
quantization-equivalent to torchvision's: its image-space output is
    x = (x_int + 0.5) * w/rw + x1 = (u + 0.5) * w/S + x1
where u = (x_int + 0.5) * S/rw - 0.5 is the argmax position in heatmap
SOURCE coordinates — so host and device decodes differ only in which grid
the surface's argmax is searched on (spacing S/rw vs S/G), never in the
coordinate mapping.  Exactness is therefore an empirical question of grid
quantization + lobe selection, measured in tests/test_kp_decode.py and
tools/kp_decode_bench.py rather than asserted.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (cv2 INTER_CUBIC uses a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0,
        np.where(ax < 2.0,
                 a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax - 4.0 * a,
                 0.0))
    return w.astype(np.float64)


def cubic_resize_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """[dst, src] matrix M such that M @ f samples f's cubic-interpolated
    surface at cv2.resize sample positions u = (i + 0.5) * src/dst - 0.5,
    with border-replicate taps (cv2's resize boundary handling)."""
    m = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        u = (i + 0.5) * scale - 0.5
        base = math.floor(u)
        frac = u - base
        taps = np.arange(base - 1, base + 3)
        w = _cubic_kernel(taps - u, a)
        # cv2 normalizes the 4-tap window (sums to 1 analytically; keep the
        # numerical normalization for the clamped-border rows)
        for t, wt in zip(taps, w):
            m[i, min(max(t, 0), src - 1)] += wt
        del frac
    return m.astype(np.float32)


def device_keypoint_argmax(kp_logits: jnp.ndarray, grid: int = 224,
                           a: float = -0.75
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Argmax of the cubic-upsampled heatmap surface, on device.

    kp_logits: [B, D, S, S, K] (any float dtype; the surface is built in
    f32).  Returns (u, v, score), each [B, D, K] f32, where (u, v) are the
    argmax position in heatmap SOURCE coordinates (x, y respectively) —
    feed to ``keypoints_from_device_argmax`` for image-space keypoints.

    Cost: two [G, S] matmuls per detection (MXU-friendly), G^2 argmax.
    Memory is bounded by mapping over the batch dim: one image's surface is
    [D, G, G, K] f32 (340 MB at D=100, G=224, K=17).
    """
    b, d, s, _, k = kp_logits.shape
    w_mat = jnp.asarray(cubic_resize_matrix(s, grid, a))  # [G, S]

    def per_image(hm):  # [D, S, S, K]
        hm32 = hm.astype(jnp.float32)
        # y then x upsample: [D, S(y), S(x), K] -> [D, G(y), S(x), K]
        t = jnp.einsum("gy,dyxk->dgxk", w_mat, hm32)
        up = jnp.einsum("hx,dgxk->dghk", w_mat, t)  # [D, G(y), G(x), K]
        flat = up.reshape(d, grid * grid, k)
        pos = jnp.argmax(flat, axis=1)  # [D, K]
        score = jnp.take_along_axis(flat, pos[:, None, :], axis=1)[:, 0, :]
        return pos.astype(jnp.int32), score

    pos, score = jax.lax.map(per_image, kp_logits)
    iy = (pos // grid).astype(jnp.float32)
    ix = (pos % grid).astype(jnp.float32)
    scale = s / grid
    u = (ix + 0.5) * scale - 0.5
    v = (iy + 0.5) * scale - 0.5
    return u, v, score


def keypoints_from_device_argmax(u: np.ndarray, v: np.ndarray,
                                 score: np.ndarray, boxes_model: np.ndarray,
                                 scale_yx: Tuple[float, float],
                                 s: int = 56
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host finish: map source-space argmax positions to original-image
    keypoints — the identical mapping torchvision applies to its grid
    index ((u + 0.5) * w/S + x1; see module docstring).

    u, v, score: [N, K]; boxes_model: [N, 4] xyxy padded-model coords.
    Returns (keypoints [N, K, 3], scores [N, K]) like
    evals/postprocess.heatmaps_to_keypoints.
    """
    n, k = u.shape
    ry, rx = scale_yx
    x1 = boxes_model[:, 0:1]
    y1 = boxes_model[:, 1:2]
    w = np.maximum(boxes_model[:, 2:3] - x1, 1.0)
    h = np.maximum(boxes_model[:, 3:4] - y1, 1.0)
    x = ((u + 0.5) * (w / s) + x1) * rx
    y = ((v + 0.5) * (h / s) + y1) * ry
    kps = np.stack([x, y, np.ones_like(x)], axis=-1).astype(np.float32)
    return kps, score.astype(np.float32)
