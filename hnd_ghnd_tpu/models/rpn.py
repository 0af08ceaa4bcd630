"""Region Proposal Network — fixed-shape XLA formulation.

Semantics parity: torchvision 0.4.2 ``RegionProposalNetwork`` + ``RPNHead``
as instantiated by the reference (src/models/org/rcnn.py:186-199: 3 anchors
per cell over 5 FPN levels, pre/post NMS top-n 2000 train / 1000 test, NMS
0.7, fg/bg IoU 0.7/0.3, 256 samples per image at 0.5 positive fraction), and
its pixel-free variant for the split-model server side
(src/models/mimic/split_rcnn.py:111-159 — consumes image *sizes* only, which
is inherently true here since anchors derive from static bucket geometry).

Dynamic-shape surgery for TPU:
  * per-level top-k replaces sort+slice;
  * score-threshold / small-box filters become masks;
  * NMS is the exact fixpoint kernel (ops.nms) with level-ids as categories;
  * outputs are fixed [post_nms_top_n] proposals + validity mask.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnd_ghnd_tpu.models import layers as L
from hnd_ghnd_tpu.ops import boxes as box_ops
from hnd_ghnd_tpu.ops import nms as nms_ops
from hnd_ghnd_tpu.ops.anchors import grid_anchors, DEFAULT_ANCHOR_SIZES, DEFAULT_ASPECT_RATIOS

Params = Dict[str, Any]


class RPNConfig(NamedTuple):
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    min_size: float = 1e-3
    anchor_sizes: tuple = DEFAULT_ANCHOR_SIZES
    aspect_ratios: tuple = DEFAULT_ASPECT_RATIOS


class RPNHead:
    """Shared 3x3 conv + 1x1 objectness / box-delta heads over all levels."""

    def __init__(self, in_channels: int = 256, num_anchors: int = 3):
        self.cin = in_channels
        self.num_anchors = num_anchors

    def init(self, rng) -> Params:
        k1, k2, k3 = jax.random.split(rng, 3)

        def normal_conv(key, kh, kw, cin, cout):
            w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * 0.01
            return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}

        return {
            "conv": normal_conv(k1, 3, 3, self.cin, self.cin),
            "cls_logits": normal_conv(k2, 1, 1, self.cin, self.num_anchors),
            "bbox_pred": normal_conv(k3, 1, 1, self.cin, 4 * self.num_anchors),
        }

    def apply(self, params: Params, feats: Sequence[jnp.ndarray]):
        """Returns per-level (objectness [B,H,W,A], deltas [B,H,W,A,4])."""
        obj, deltas = [], []
        for f in feats:
            t = L.relu(L.conv2d(params["conv"], f, padding=1))
            o = L.conv2d(params["cls_logits"], t)
            d = L.conv2d(params["bbox_pred"], t)
            b, h, w, _ = o.shape
            obj.append(o)
            deltas.append(d.reshape(b, h, w, self.num_anchors, 4))
        return obj, deltas


def _flatten_level(o: jnp.ndarray, d: jnp.ndarray):
    """[B,H,W,A]/[B,H,W,A,4] -> [B,HWA]/[B,HWA,4] — position-major,
    anchor-minor: the same order as ops.anchors.grid_anchors."""
    b = o.shape[0]
    return o.reshape(b, -1), d.reshape(b, -1, 4)


class RPN:
    def __init__(self, cfg: RPNConfig = RPNConfig(), head: Optional[RPNHead] = None):
        self.cfg = cfg
        self.head = head or RPNHead(num_anchors=len(cfg.aspect_ratios[0]))

    def init(self, rng) -> Params:
        return {"head": self.head.init(rng)}

    # ------------------------------------------------------------- proposals
    def propose(self, params: Params, feats: Sequence[jnp.ndarray],
                image_sizes: jnp.ndarray, image_shape: Tuple[int, int], *,
                training: bool):
        """Generate proposals.

        feats: FPN levels (incl. pool level). image_sizes: [B, 2] valid (h, w)
        per image inside the padded ``image_shape`` bucket.
        Returns (proposals [B, post_nms, 4], proposal_valid [B, post_nms],
                 raw (objectness, deltas, anchors) for the loss path).
        """
        cfg = self.cfg
        pre_nms = cfg.pre_nms_top_n_train if training else cfg.pre_nms_top_n_test
        post_nms = cfg.post_nms_top_n_train if training else cfg.post_nms_top_n_test

        obj_lvls, delta_lvls = self.head.apply(params["head"], feats)
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors_np = grid_anchors(grid_sizes, image_shape,
                                  cfg.anchor_sizes, cfg.aspect_ratios)

        top_boxes, top_scores, top_lvl = [], [], []
        for li, (o, d) in enumerate(zip(obj_lvls, delta_lvls)):
            o_flat, d_flat = _flatten_level(o, d)  # [B, N_l], [B, N_l, 4]
            n_l = o_flat.shape[1]
            k = min(pre_nms, n_l)
            # proposals must not backprop into the deltas (reference detaches)
            d_flat = jax.lax.stop_gradient(d_flat)
            o_flat = jax.lax.stop_gradient(o_flat)
            scores, idx = jax.lax.top_k(o_flat, k)  # [B, k]
            anchors = jnp.asarray(anchors_np[li])  # [N_l, 4]
            sel_anchors = anchors[idx]  # [B, k, 4]
            sel_deltas = jnp.take_along_axis(d_flat, idx[..., None], axis=1)
            boxes = box_ops.decode(sel_deltas, sel_anchors)
            top_boxes.append(boxes)
            top_scores.append(scores)
            top_lvl.append(jnp.full((boxes.shape[0], k), li, jnp.int32))

        # Per-level NMS: level-categorized batched NMS never suppresses
        # across levels, so running each level independently is exactly
        # equivalent — and avoids the (sum n_l)^2 suppression matrix in
        # favor of sum(n_l^2), ~5x less HBM traffic at COCO scale.
        keep_masks = []
        for li in range(len(top_boxes)):
            bx = box_ops.clip_to_image(top_boxes[li], image_sizes[:, None, :])
            top_boxes[li] = bx
            va = box_ops.small_box_mask(bx, cfg.min_size)
            keep_masks.append(jax.vmap(
                lambda b, s, v: nms_ops.nms_keep_mask(b, s, cfg.nms_thresh, v)
            )(bx, top_scores[li], va))

        boxes = jnp.concatenate(top_boxes, axis=1)      # [B, M, 4]
        scores = jnp.concatenate(top_scores, axis=1)    # [B, M]
        keep = jnp.concatenate(keep_masks, axis=1)      # [B, M]

        # global top post_nms by score among survivors
        neg_inf = jnp.finfo(scores.dtype).min
        masked = jnp.where(keep, scores, neg_inf)
        top_s, top_idx = jax.lax.top_k(masked, post_nms)  # [B, post_nms]
        proposals = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        prop_valid = top_s > neg_inf
        return proposals, prop_valid, (obj_lvls, delta_lvls, anchors_np)

    # ------------------------------------------------------------------ loss
    def loss(self, raw, targets: Dict[str, jnp.ndarray], rng: jax.Array):
        """RPN losses (training).

        targets: {'boxes': [B, G, 4], 'boxes_valid': [B, G] bool}.
        Matching: IoU >= 0.7 fg, < 0.3 bg, between ignored; low-quality
        matches allowed (best anchor per gt forced fg).  256 anchors sampled
        per image at <= 50% positive.  Losses: BCE-with-logits on sampled
        objectness, smooth-L1 (beta=1/9, sum) on positive regressions,
        both normalized by the total sampled count over the CONCATENATED
        batch (torchvision compute_loss: cat all images' sampled indices,
        then sum/total) — exact even when per-image sampled counts differ
        (scarce-positive or heavily-ignored images).
        """
        cfg = self.cfg
        obj_lvls, delta_lvls, anchors_np = raw
        b = obj_lvls[0].shape[0]
        objectness = jnp.concatenate(
            [o.reshape(b, -1) for o in obj_lvls], axis=1)  # [B, N]
        deltas = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in delta_lvls], axis=1)  # [B, N, 4]
        anchors = jnp.asarray(np.concatenate(anchors_np, axis=0))  # [N, 4]

        def per_image(obj, dl, gt, gt_valid, key):
            labels, matched = _match_anchors(
                anchors, gt, gt_valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh,
                allow_low_quality=True)
            pos, neg = _balanced_sample(
                labels, cfg.batch_size_per_image, cfg.positive_fraction, key)
            reg_targets = box_ops.encode(matched, anchors)
            box_l = _smooth_l1(dl, reg_targets, beta=1.0 / 9.0)
            box_sum = jnp.sum(box_l.sum(-1) * pos)
            sampled = pos + neg
            obj_sum = jnp.sum(
                _bce_logits(obj, labels.astype(jnp.float32)) * sampled)
            return box_sum, obj_sum, sampled.sum()

        keys = jax.random.split(rng, b)
        box_sums, obj_sums, counts = jax.vmap(per_image)(
            objectness, deltas, targets["boxes"],
            targets["boxes_valid"], keys)
        n_total = jnp.maximum(counts.sum(), 1.0)
        return {"loss_objectness": obj_sums.sum() / n_total,
                "loss_rpn_box_reg": box_sums.sum() / n_total}


# ---------------------------------------------------------------------------
# Matching / sampling helpers (shared with RoIHeads)
# ---------------------------------------------------------------------------

def _match_anchors(anchors: jnp.ndarray, gt: jnp.ndarray, gt_valid: jnp.ndarray,
                   fg_thresh: float, bg_thresh: float, *,
                   allow_low_quality: bool):
    """torchvision Matcher semantics with masks instead of index tensors.

    Returns (labels [N] float: 1 fg / 0 bg / -1 ignore, matched_boxes [N, 4]).
    With no valid gt, everything is background (reference raises instead;
    images without annotations are filtered by the data pipeline).
    """
    iou = box_ops.pairwise_iou(gt, anchors)  # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)                      # [N]
    best_iou = jnp.max(iou, axis=0)                        # [N]
    labels = jnp.where(best_iou >= fg_thresh, 1.0,
                       jnp.where(best_iou < bg_thresh, 0.0, -1.0))
    if allow_low_quality:
        # every gt's best anchors (including ties) become foreground
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
        force_fg = jnp.any(is_best, axis=0)
        # torchvision restores the *original* match index for forced anchors;
        # argmax over gt already is that index for ties broken identically.
        labels = jnp.where(force_fg, 1.0, labels)
    any_gt = jnp.any(gt_valid)
    labels = jnp.where(any_gt, labels, jnp.zeros_like(labels))
    matched = gt[jnp.clip(best_gt, 0, gt.shape[0] - 1)]
    return labels, matched


def _balanced_sample(labels: jnp.ndarray, batch_size: int, pos_fraction: float,
                     key: jax.Array):
    """BalancedPositiveNegativeSampler as masks: pick up to
    ``batch_size * pos_fraction`` random positives and fill with random
    negatives.  Random permutation via ranked random keys (fixed shape)."""
    n = labels.shape[0]
    kp, kn = jax.random.split(key)
    num_pos_cap = int(batch_size * pos_fraction)

    is_pos = labels == 1.0
    is_neg = labels == 0.0
    num_pos = jnp.minimum(is_pos.sum(), num_pos_cap)
    num_neg = jnp.minimum(is_neg.sum(), batch_size - num_pos)

    def pick(mask, count, k):
        r = jax.random.uniform(k, (n,))
        r = jnp.where(mask, r, 2.0)  # invalid entries sort last
        order = jnp.argsort(r)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return (rank < count) & mask

    return (pick(is_pos, num_pos, kp).astype(jnp.float32),
            pick(is_neg, num_neg, kn).astype(jnp.float32))


def _smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    # numerically-stable binary cross entropy with logits
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
