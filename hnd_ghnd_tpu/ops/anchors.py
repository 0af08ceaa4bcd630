"""Anchor generation for FPN R-CNN — static-shape, precomputable.

Semantics follow torchvision 0.4.2's ``AnchorGenerator`` as configured by the
reference (sizes ((32,),(64,),(128,),(256,),(512,)), aspect ratios
(0.5, 1.0, 2.0) per level; reference: src/models/org/rcnn.py:180-185), and its
shape-only variant used on the server side of the split model
(src/models/mimic/split_rcnn.py:76-108), which derives anchors from
``(padded image size, feature-map sizes)`` without touching pixels.

On TPU every batch bucket has a static padded size, so anchors are pure
constants per bucket: we compute them once at trace time (numpy) and XLA
folds them into the program.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

DEFAULT_ANCHOR_SIZES: Tuple[Tuple[int, ...], ...] = ((32,), (64,), (128,), (256,), (512,))
DEFAULT_ASPECT_RATIOS: Tuple[Tuple[float, ...], ...] = ((0.5, 1.0, 2.0),) * 5


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered template anchors [A, 4] for one level, rounded like
    torchvision's ``generate_anchors``."""
    scales = np.asarray(sizes, dtype=np.float32)
    ratios = np.asarray(aspect_ratios, dtype=np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    return np.round(base).astype(np.float32)


def grid_anchors(
    grid_sizes: Sequence[Tuple[int, int]],
    image_size: Tuple[int, int],
    sizes: Sequence[Sequence[float]] = DEFAULT_ANCHOR_SIZES,
    aspect_ratios: Sequence[Sequence[float]] = DEFAULT_ASPECT_RATIOS,
) -> List[np.ndarray]:
    """Per-level anchors for a padded image of static ``image_size`` (H, W).

    grid_sizes: [(h_l, w_l)] per FPN level.
    Returns a list of [h_l * w_l * A, 4] float32 arrays, position-major /
    anchor-minor — exactly the flattening order the RPN head's predictions use
    after the (N, A*4, H, W) -> (N, H*W*A, 4) permutation.

    Strides are float ``image_size / grid_size`` like the reference's
    shape-driven ModifiedAnchorGenerator (split_rcnn.py:98-100).
    """
    out = []
    for (gh, gw), lvl_sizes, lvl_ratios in zip(grid_sizes, sizes, aspect_ratios):
        base = cell_anchors(lvl_sizes, lvl_ratios)  # [A, 4]
        stride_h = image_size[0] / gh
        stride_w = image_size[1] / gw
        shifts_x = np.arange(gw, dtype=np.float32) * stride_w
        shifts_y = np.arange(gh, dtype=np.float32) * stride_h
        sx, sy = np.meshgrid(shifts_x, shifts_y)  # [gh, gw]
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [gh*gw,1,4]
        anchors = (shifts + base[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return out


def fpn_grid_sizes(image_size: Tuple[int, int], num_levels: int = 5,
                   first_stride: int = 4) -> List[Tuple[int, int]]:
    """Feature-map sizes for FPN levels P2..P6 given a padded image size.

    The ResNet+FPN produces ceil-division sizes at strides 4, 8, 16, 32 and a
    stride-64 max-pool level on top (LastLevelMaxPool halves with ceil).
    """
    h, w = image_size
    sizes = []
    stride = first_stride
    for _ in range(num_levels - 1):
        sizes.append(((h + stride - 1) // stride, (w + stride - 1) // stride))
        stride *= 2
    # LastLevelMaxPool: kernel 1, stride 2 on the previous level
    ph, pw = sizes[-1]
    sizes.append(((ph + 1) // 2, (pw + 1) // 2))
    return sizes
