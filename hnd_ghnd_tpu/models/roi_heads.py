"""RoI heads: box / mask / keypoint branches — fixed-shape XLA.

Semantics parity: torchvision 0.4.2 ``RoIHeads`` + the head/predictor stacks
the reference composes (src/models/org/rcnn.py: TwoMLPHead 12544->1024->1024
and FastRCNNPredictor :200-215; MaskRCNNHeads 4x conv256 + deconv predictor
:258-272; KeypointRCNNHeads 8x conv512 + deconv predictor :330-345), with RoI
parameters box_score_thresh 0.05, box_nms_thresh 0.5, 100 detections/img,
fg/bg IoU 0.5/0.5, 512 samples at 0.25 positive fraction (rcnn.py:152-158).

Fixed-shape strategy: score thresholds and per-class filtering are masks over
a [num_proposals x (num_classes-1)] candidate grid, NMS is the exact fixpoint
kernel with class ids as categories, final detections are a top-100 gather.
Mask/keypoint branches run on the fixed top-100 detections at eval; their
losses run on the fixed positive-sample slots at train.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L
from hnd_ghnd_tpu.models.rpn import (_balanced_sample, _bce_logits,
                                     _smooth_l1)
from hnd_ghnd_tpu.ops import boxes as box_ops
from hnd_ghnd_tpu.ops import nms as nms_ops
from hnd_ghnd_tpu.ops.pallas_roi import (
    pallas_multiscale_roi_align_batch, pallas_multiscale_roi_align_batch_vjp)
from hnd_ghnd_tpu.ops import kp_decode as kp_decode_ops
from hnd_ghnd_tpu.ops.roi_align import (multiscale_roi_align,
                                        multiscale_roi_align_batch,
                                        quantize_fpn_levels)

Params = Dict[str, Any]

BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class RoIConfig(NamedTuple):
    num_classes: int = 91
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    box_pool_size: int = 7
    mask_pool_size: int = 14
    keypoint_pool_size: int = 14
    num_keypoints: int = 17
    with_mask: bool = False
    with_keypoint: bool = False
    # eval-only int8 pooling table (model params `int8_roi_pool`): halves
    # the RoIAlign gather bytes — the eval-path bandwidth floor — at the
    # cost of int8 feature precision in the pooled tensors
    int8_pool: bool = False
    # RoIAlign implementation (model params `roi_pool_impl`), eval AND
    # train pooling: "xla" = flattened row-gather program (ops/roi_align
    # .py), "pallas" = per-RoI window-DMA kernel (ops/pallas_roi.py) that
    # fuses the bilinear weighting in VMEM (train path: pallas forward +
    # XLA linear-transpose backward, see pallas_roi._make_vjp_pool),
    # "auto" (default) = pallas on a TPU backend, xla elsewhere
    # (Mosaic-interpret pooling would crawl on CPU).  Measured batch-8
    # 832x1344 bf16: full eval 160.9 -> 69.8 ms (BASELINE.md round-4).
    roi_pool_impl: str = "auto"
    # keypoint heatmap decode (model params `kp_decode`): "host" = exact
    # torchvision semantics (per-box dynamic bicubic resize on host,
    # evals/postprocess.heatmaps_to_keypoints), "device" = argmax over the
    # same cubic surface on a static kp_decode_grid^2 MXU-upsampled grid
    # (ops/kp_decode.py) — quantization-equivalent geometry, ~1000x less
    # D2H payload ([B,D,K]x3 scalars instead of [B,D,56,56,K] heatmaps).
    # Measured exactness + rates: BASELINE.md round-5.
    kp_decode: str = "host"
    kp_decode_grid: int = 224

    def resolved_pool_impl(self) -> str:
        if self.roi_pool_impl == "auto":
            return ("pallas" if jax.default_backend() == "tpu" else "xla")
        return self.roi_pool_impl


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

class TwoMLPHead:
    def __init__(self, in_features: int, rep_size: int = 1024):
        self.cin = in_features
        self.rep = rep_size

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {"fc6": L.linear_init(k1, self.cin, self.rep),
                "fc7": L.linear_init(k2, self.rep, self.rep)}

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        # x: [R, P, P, C] -> flatten channel-major (torch order) for ckpt compat
        r = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(r, -1)
        x = L.relu(L.linear(params["fc6"], x))
        return L.relu(L.linear(params["fc7"], x))


class FastRCNNPredictor:
    def __init__(self, in_features: int, num_classes: int):
        self.cin = in_features
        self.ncls = num_classes

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {"cls_score": L.linear_init(k1, self.cin, self.ncls),
                "bbox_pred": L.linear_init(k2, self.cin, self.ncls * 4)}

    def apply(self, params: Params, x: jnp.ndarray):
        return (L.linear(params["cls_score"], x),
                L.linear(params["bbox_pred"], x))


class MaskHead:
    """4x (3x3 conv 256 + ReLU) -> deconv 2x + ReLU -> 1x1 conv to classes."""

    def __init__(self, in_channels: int = 256, num_classes: int = 91,
                 layers: Tuple[int, ...] = (256, 256, 256, 256), dim_reduced: int = 256):
        self.cin = in_channels
        self.layers = layers
        self.dim_reduced = dim_reduced
        self.ncls = num_classes

    def init(self, rng) -> Params:
        keys = jax.random.split(rng, len(self.layers) + 2)
        p: Params = {}
        prev = self.cin

        def msra(key, kh, kw, cin, cout):
            std = math.sqrt(2.0 / (kh * kw * cout))
            return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * std,
                    "b": jnp.zeros((cout,), jnp.float32)}

        for i, ch in enumerate(self.layers):
            p[f"mask_fcn{i + 1}"] = msra(keys[i], 3, 3, prev, ch)
            prev = ch
        p["conv5_mask"] = msra(keys[-2], 2, 2, prev, self.dim_reduced)
        p["mask_fcn_logits"] = msra(keys[-1], 1, 1, self.dim_reduced, self.ncls)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(len(self.layers)):
            x = L.relu(L.conv2d(params[f"mask_fcn{i + 1}"], x, padding=1))
        x = L.relu(L.conv_transpose2d(params["conv5_mask"], x, stride=2))
        return L.conv2d(params["mask_fcn_logits"], x)  # [R, 28, 28, ncls]


class KeypointHead:
    """8x (3x3 conv 512 + ReLU) -> deconv 4x4/2 to K channels -> 2x bilinear."""

    def __init__(self, in_channels: int = 256, num_keypoints: int = 17,
                 layers: Tuple[int, ...] = (512,) * 8):
        self.cin = in_channels
        self.layers = layers
        self.nkp = num_keypoints

    def init(self, rng) -> Params:
        keys = jax.random.split(rng, len(self.layers) + 1)
        p: Params = {}
        prev = self.cin
        for i, ch in enumerate(self.layers):
            fan_in = 3 * 3 * prev
            std = math.sqrt(2.0 / fan_in)
            p[str(i)] = {"w": jax.random.normal(keys[i], (3, 3, prev, ch)) * std,
                         "b": jnp.zeros((ch,), jnp.float32)}
            prev = ch
        fan_in = 4 * 4 * prev
        std = math.sqrt(2.0 / fan_in)
        p["kps_score_lowres"] = {
            "w": jax.random.normal(keys[-1], (4, 4, prev, self.nkp)) * std,
            "b": jnp.zeros((self.nkp,), jnp.float32)}
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(len(self.layers)):
            x = L.relu(L.conv2d(params[str(i)], x, padding=1))
        x = L.conv_transpose2d(params["kps_score_lowres"], x, stride=2, padding=1)
        # interpolate scale 2, bilinear, align_corners=False -> 56x56
        r, h, w, c = x.shape
        x = jax.image.resize(x, (r, h * 2, w * 2, c), method="linear")
        return x  # [R, 56, 56, K]


# ---------------------------------------------------------------------------
# RoIHeads
# ---------------------------------------------------------------------------

class RoIHeads:
    def __init__(self, cfg: RoIConfig, out_channels: int = 256):
        self.cfg = cfg
        self.out_channels = out_channels
        rep = 1024
        self.box_head = TwoMLPHead(out_channels * cfg.box_pool_size ** 2, rep)
        self.box_predictor = FastRCNNPredictor(rep, cfg.num_classes)
        self.mask_head = MaskHead(out_channels, cfg.num_classes) if cfg.with_mask else None
        self.keypoint_head = (KeypointHead(out_channels, cfg.num_keypoints)
                              if cfg.with_keypoint else None)

    def init(self, rng) -> Params:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        p: Params = {"box_head": self.box_head.init(k1),
                     "box_predictor": self.box_predictor.init(k2)}
        if self.mask_head is not None:
            p["mask_head"] = self.mask_head.init(k3)
        if self.keypoint_head is not None:
            p["keypoint_head"] = self.keypoint_head.init(k4)
        return p

    # -------------------------------------------------------------- box path
    def _box_forward(self, params: Params, feats, boxes, image_shape, valid):
        pooled = multiscale_roi_align(feats[:4], boxes, image_shape,
                                      self.cfg.box_pool_size, boxes_valid=valid)
        rep = self.box_head.apply(params["box_head"], pooled)
        return self.box_predictor.apply(params["box_predictor"], rep)

    def infer(self, params: Params, feats: Sequence[jnp.ndarray],
              proposals: jnp.ndarray, prop_valid: jnp.ndarray,
              image_sizes: jnp.ndarray, image_shape: Tuple[int, int]):
        """Eval path for one batch. feats: per-level [B, H, W, C].

        Returns dict of fixed-shape detections per image:
          boxes [B, D, 4], scores [B, D], labels [B, D], valid [B, D]
          (+ mask_logits [B, D, 28, 28], keypoint_logits [B, D, 56, 56, K]).
        """
        cfg = self.cfg
        b, r = proposals.shape[:2]

        # Pool + box head over the WHOLE batch flat: one large gather and
        # one [B*R, ...] matmul instead of B vmapped small ones (the gather
        # is the eval-path bottleneck; see ops/roi_align.py).  With int8
        # pooling, quantize the levels ONCE here and share the tables across
        # the box/mask/keypoint pooling calls — requantizing per call costs
        # a full feature-map pass each time.
        quant = quantize_fpn_levels(feats[:4]) if cfg.int8_pool else None
        pool_batch = (pallas_multiscale_roi_align_batch
                      if cfg.resolved_pool_impl() == "pallas"
                      else multiscale_roi_align_batch)
        pooled = pool_batch(
            feats[:4], proposals, image_shape, cfg.box_pool_size,
            boxes_valid=prop_valid, quant=quant)  # [B, R, P, P, C]
        rep = self.box_head.apply(
            params["box_head"], pooled.reshape((b * r,) + pooled.shape[2:]))
        flat_cls, flat_deltas = self.box_predictor.apply(
            params["box_predictor"], rep)
        all_cls = flat_cls.reshape(b, r, -1)
        all_deltas = flat_deltas.reshape(b, r, -1)

        def per_image(cls_logits, box_deltas, props, pvalid, isize):
            scores = jax.nn.softmax(cls_logits, axis=-1)  # [R, C]
            ncls = cfg.num_classes
            deltas = box_deltas.reshape(r, ncls, 4)
            boxes = box_ops.decode(deltas, props[:, None, :], BOX_CODER_WEIGHTS)
            boxes = box_ops.clip_to_image(boxes, isize)

            # drop background column; flatten [R, C-1]
            fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
            fg_scores = scores[:, 1:].reshape(-1)
            fg_labels = jnp.tile(jnp.arange(1, ncls, dtype=jnp.int32), (r,))
            cand_valid = (pvalid[:, None]
                          & (scores[:, 1:] > cfg.score_thresh)
                          & box_ops.small_box_mask(boxes[:, 1:, :], 1e-2)
                          ).reshape(-1)

            # Pre-trim to a bounded candidate set before the O(N^2) NMS:
            # keep the best 4096 candidates by (masked) score — far more than
            # can ever survive 100-detections-per-image selection.
            cap = min(4096, fg_scores.shape[0])
            neg_inf = jnp.finfo(fg_scores.dtype).min
            trim_scores, trim_idx = jax.lax.top_k(
                jnp.where(cand_valid, fg_scores, neg_inf), cap)
            t_boxes = fg_boxes[trim_idx]
            t_labels = fg_labels[trim_idx]
            t_valid = trim_scores > neg_inf

            keep_idx, keep_ok = nms_ops.batched_nms(
                t_boxes, trim_scores, t_labels, cfg.nms_thresh,
                cfg.detections_per_img, t_valid)
            det_boxes = t_boxes[keep_idx]
            det_scores = jnp.where(keep_ok, trim_scores[keep_idx], 0.0)
            det_labels = jnp.where(keep_ok, t_labels[keep_idx], 0)
            return det_boxes, det_scores, det_labels, keep_ok

        det_boxes, det_scores, det_labels, det_valid = jax.vmap(per_image)(
            all_cls, all_deltas, proposals, prop_valid, image_sizes)

        out = {"boxes": det_boxes, "scores": det_scores,
               "labels": det_labels, "valid": det_valid}
        d = det_boxes.shape[1]

        if self.mask_head is not None:
            pooled = pool_batch(
                feats[:4], det_boxes, image_shape, self.cfg.mask_pool_size,
                boxes_valid=det_valid, quant=quant)
            logits = self.mask_head.apply(
                params["mask_head"],
                pooled.reshape((b * d,) + pooled.shape[2:]))
            logits = logits.reshape((b, d) + logits.shape[1:])
            # select the channel of each detection's label -> [B, D, 28, 28]
            sel = jnp.take_along_axis(
                logits, det_labels[:, :, None, None, None], axis=-1)[..., 0]
            out["mask_probs"] = jax.nn.sigmoid(sel)

        if self.keypoint_head is not None:
            pooled = pool_batch(
                feats[:4], det_boxes, image_shape,
                self.cfg.keypoint_pool_size, boxes_valid=det_valid,
                quant=quant)
            kp_logits = self.keypoint_head.apply(
                params["keypoint_head"],
                pooled.reshape((b * d,) + pooled.shape[2:]))
            kp_logits = kp_logits.reshape((b, d) + kp_logits.shape[1:])
            if cfg.kp_decode == "device":
                u, v, kp_score = kp_decode_ops.device_keypoint_argmax(
                    kp_logits, grid=cfg.kp_decode_grid)
                out["kp_u"] = u
                out["kp_v"] = v
                out["kp_score"] = kp_score
            else:
                out["keypoint_logits"] = kp_logits

        return out

    # ------------------------------------------------------------ train path
    def select_training_samples(self, proposals, prop_valid, targets, rng):
        """Sample 512 proposals/img at 25% positive after appending gt boxes
        (torchvision add_gt_proposals semantics).

        Returns (boxes [B, S, 4], labels [B, S] int, reg_targets [B, S, 4],
        sampled_pos [B, S] bool, sampled [B, S] bool, matched_gt_idx [B, S]).
        """
        cfg = self.cfg

        def per_image(props, pvalid, gt_boxes, gt_labels, gt_valid, key):
            all_boxes = jnp.concatenate([props, gt_boxes], axis=0)
            all_valid = jnp.concatenate([pvalid, gt_valid], axis=0)
            iou = box_ops.pairwise_iou(gt_boxes, all_boxes)
            iou = jnp.where(gt_valid[:, None], iou, -1.0)
            iou = jnp.where(all_valid[None, :], iou, -1.0)
            best_gt = jnp.argmax(iou, axis=0)
            best_iou = jnp.max(iou, axis=0)
            is_fg = best_iou >= cfg.fg_iou_thresh
            is_bg = (best_iou < cfg.bg_iou_thresh) & all_valid
            labels01 = jnp.where(is_fg, 1.0, jnp.where(is_bg, 0.0, -1.0))
            pos, neg = _balanced_sample(
                labels01, cfg.batch_size_per_image, cfg.positive_fraction, key)
            sampled = (pos + neg) > 0
            # fixed-size gather of the sampled slots
            order = jnp.argsort(~sampled)  # sampled first (stable)
            sel = order[:cfg.batch_size_per_image]
            sel_boxes = all_boxes[sel]
            sel_pos = pos[sel] > 0
            sel_on = sampled[sel]
            sel_gt = best_gt[sel]
            cls = jnp.where(sel_pos, gt_labels[sel_gt], 0)
            reg = box_ops.encode(gt_boxes[sel_gt], sel_boxes, BOX_CODER_WEIGHTS)
            return sel_boxes, cls, reg, sel_pos, sel_on, sel_gt

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        return jax.vmap(per_image)(
            proposals, prop_valid, targets["boxes"], targets["labels"],
            targets["boxes_valid"], keys)

    def _train_pool(self, feats, boxes, image_shape, pool_size, valid):
        """Batched train-path pooling through the configured impl.

        "pallas" runs the window-DMA kernel forward with the XLA
        linear-transpose backward (ops/pallas_roi._make_vjp_pool); "xla"
        differentiates the gather program directly.  One batch-level pool
        feeds one [B*R, ...] head matmul — same structure as ``infer``."""
        fn = (pallas_multiscale_roi_align_batch_vjp
              if self.cfg.resolved_pool_impl() == "pallas"
              else multiscale_roi_align_batch)
        return fn(feats[:4], boxes, image_shape, pool_size,
                  boxes_valid=valid)

    def loss(self, params: Params, feats, image_shape, sampled):
        """Fast R-CNN classification + box-regression losses.

        torchvision fastrcnn_loss normalization exactly: cross-entropy is
        the MEAN over the concatenated batch of sampled proposals, box
        smooth-L1 is the positive-row SUM over the same concatenation
        divided by the total sampled count — correct even when per-image
        sampled counts differ."""
        sel_boxes, cls, reg, sel_pos, sel_on, _ = sampled
        b, r = sel_boxes.shape[:2]

        pooled = self._train_pool(feats, sel_boxes, image_shape,
                                  self.cfg.box_pool_size, sel_on)
        rep = self.box_head.apply(
            params["box_head"], pooled.reshape((b * r,) + pooled.shape[2:]))
        flat_cls, flat_deltas = self.box_predictor.apply(
            params["box_predictor"], rep)
        all_cls = flat_cls.reshape(b, r, -1)
        all_deltas = flat_deltas.reshape(b, r, -1)

        def per_image(cls_logits, box_deltas, labels, reg_t, pos, on):
            logp = jax.nn.log_softmax(cls_logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            cls_sum = jnp.sum(ce * on)
            deltas = box_deltas.reshape(r, self.cfg.num_classes, 4)
            sel_deltas = jnp.take_along_axis(
                deltas, labels[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            l1 = _smooth_l1(sel_deltas, reg_t, beta=1.0).sum(-1)
            box_sum = jnp.sum(l1 * pos)
            return cls_sum, box_sum, on.sum()

        cls_sums, box_sums, counts = jax.vmap(per_image)(
            all_cls, all_deltas, cls, reg, sel_pos.astype(jnp.float32),
            sel_on.astype(jnp.float32))
        n_total = jnp.maximum(counts.sum(), 1.0)
        return {"loss_classifier": cls_sums.sum() / n_total,
                "loss_box_reg": box_sums.sum() / n_total}

    # --------------------------------------------------- mask/keypoint train
    MAX_POSITIVES = 128  # >= 512 * 0.25, the sampler's positive cap

    def _select_positives(self, sampled, max_pos: int):
        """Fixed-size gather of the positive sample slots per image."""
        sel_boxes, cls, _, sel_pos, _, sel_gt = sampled

        def per_image(boxes, labels, pos, gt_idx):
            order = jnp.argsort(~pos)  # positives first (stable)
            idx = order[:max_pos]
            return (boxes[idx], labels[idx], pos[idx], gt_idx[idx])

        return jax.vmap(per_image)(sel_boxes, cls, sel_pos, sel_gt)

    def mask_loss(self, params: Params, feats, image_shape, sampled,
                  gt_boxes: jnp.ndarray, gt_mask_crops: jnp.ndarray):
        """Mask R-CNN training loss (torchvision maskrcnn_loss semantics):
        BCE between the positive proposals' predicted 28x28 mask (at the gt
        class channel) and the gt mask projected onto the proposal box.

        gt_mask_crops: [B, G, R+2, R+2] box-aligned gt rasters (each gt's
        full-res mask resampled into its own box at R=MASK_CROP_SIZE, 1px
        zero border).  The reference projects the full-res image raster
        (torchvision project_masks_on_boxes via rcnn.py:262-272); sampling
        the box-aligned crop reproduces that to ~3e-3 mean target delta /
        <1e-3 loss delta (tests/test_train_losses.py oracle; PARITY.md) at
        1/16th the device memory of full-res rasters.
        """
        boxes, labels, pos, gt_idx = self._select_positives(
            sampled, self.MAX_POSITIVES)
        m = 2 * self.cfg.mask_pool_size  # 28
        b, np_ = boxes.shape[:2]

        pooled = self._train_pool(feats, boxes, image_shape,
                                  self.cfg.mask_pool_size, pos > 0)
        logits = self.mask_head.apply(
            params["mask_head"], pooled.reshape((b * np_,) + pooled.shape[2:]))
        logits = logits.reshape((b, np_) + logits.shape[1:])

        def per_image(logits_i, bxs, lbl, p, gidx, g_boxes, crops):
            sel = jnp.take_along_axis(
                logits_i, lbl[:, None, None, None], axis=-1)[..., 0]  # [P,28,28]
            own_crop = crops[gidx].astype(jnp.float32)   # [P, R+2, R+2]
            own_gbox = g_boxes[gidx]                     # [P, 4]
            targets = _project_boxes_on_crops(own_crop, own_gbox, bxs, m)
            bce = _bce_logits(sel, targets)
            per_roi = bce.mean(axis=(1, 2))
            return jnp.sum(per_roi * p), p.sum()

        # torchvision maskrcnn_loss: BCE mean over the concatenated batch of
        # positive proposals (every 28x28 raster weighted equally)
        bce_sums, counts = jax.vmap(per_image)(logits, boxes, labels,
                                               pos.astype(jnp.float32),
                                               gt_idx, gt_boxes,
                                               gt_mask_crops)
        return {"loss_mask": bce_sums.sum() / jnp.maximum(counts.sum(), 1.0)}

    def keypoint_loss(self, params: Params, feats, image_shape, sampled,
                      gt_keypoints: jnp.ndarray):
        """Keypoint R-CNN training loss (torchvision keypointrcnn_loss):
        cross-entropy over the 56x56 heatmap grid at each visible gt
        keypoint that falls inside its positive proposal."""
        boxes, labels, pos, gt_idx = self._select_positives(
            sampled, self.MAX_POSITIVES)
        hm = 4 * self.cfg.keypoint_pool_size  # 56
        b, np_ = boxes.shape[:2]

        pooled = self._train_pool(feats, boxes, image_shape,
                                  self.cfg.keypoint_pool_size, pos > 0)
        all_logits = self.keypoint_head.apply(
            params["keypoint_head"],
            pooled.reshape((b * np_,) + pooled.shape[2:]))
        all_logits = all_logits.reshape((b, np_) + all_logits.shape[1:])

        def per_image(logits, bxs, p, gidx, kps):
            # [P, 56, 56, K] -> [P, K, 56*56]
            plogits = jnp.transpose(logits, (0, 3, 1, 2)).reshape(
                logits.shape[0], logits.shape[3], -1)
            own_kp = kps[gidx]  # [P, K, 3]
            x1, y1 = bxs[:, 0:1], bxs[:, 1:2]
            w = jnp.maximum(bxs[:, 2:3] - x1, 1e-6)
            h = jnp.maximum(bxs[:, 3:4] - y1, 1e-6)
            gx = jnp.floor((own_kp[..., 0] - x1) * hm / w)
            gy = jnp.floor((own_kp[..., 1] - y1) * hm / h)
            inside = (gx >= 0) & (gx < hm) & (gy >= 0) & (gy < hm)
            # boundary snap (torchvision keypoints_to_heatmap)
            gx = jnp.clip(gx, 0, hm - 1)
            gy = jnp.clip(gy, 0, hm - 1)
            valid = inside & (own_kp[..., 2] > 0) & (p > 0)[:, None]
            target = (gy * hm + gx).astype(jnp.int32)  # [P, K]
            logp = jax.nn.log_softmax(plogits, axis=-1)
            ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
            vf = valid.astype(jnp.float32)
            return jnp.sum(ce * vf), vf.sum()

        # torchvision keypointrcnn_loss: cross-entropy mean over the
        # concatenated batch of visible keypoints
        ce_sums, counts = jax.vmap(per_image)(all_logits, boxes,
                                              pos.astype(jnp.float32), gt_idx,
                                              gt_keypoints)
        return {"loss_keypoint": ce_sums.sum() / jnp.maximum(counts.sum(), 1.0)}


MASK_CROP_SIZE = 112  # box-aligned gt raster resolution (4x the 28 target)


def _project_boxes_on_crops(crops: jnp.ndarray, gt_boxes: jnp.ndarray,
                            boxes: jnp.ndarray, out_size: int,
                            sampling_ratio: int = 2) -> jnp.ndarray:
    """Project proposal boxes onto box-aligned gt rasters.

    crops [P, R+2, R+2]: each gt mask resampled into an R x R grid over its
    own box (pixel centers at gy1 + (u+0.5)*gh/R) with a 1px zero border so
    samples outside the gt box decay to zero like the reference's full-image
    raster.  boxes/gt_boxes [P, 4] in image coords.  Returns [P, out, out]
    float targets — roi_align sample points identical to torchvision
    project_masks_on_boxes, evaluated on the crop raster.
    """
    p, rp, _ = crops.shape
    r = rp - 2
    s = sampling_ratio

    def one(crop, gbox, box):
        x1, y1, x2, y2 = box
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        bins = jnp.arange(out_size, dtype=jnp.float32)
        samp = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        ys = y1 + bins[:, None] * bin_h + samp[None, :] * bin_h  # [out, s]
        xs = x1 + bins[:, None] * bin_w + samp[None, :] * bin_w
        gw = jnp.maximum(gbox[2] - gbox[0], 1.0)
        gh = jnp.maximum(gbox[3] - gbox[1], 1.0)
        # image point -> padded-crop coordinate (crop[u+1] sits at image
        # y = gy1 + (u+0.5)*gh/R)
        u = (ys - gbox[1]) * r / gh + 0.5
        v = (xs - gbox[0]) * r / gw + 0.5
        from hnd_ghnd_tpu.ops.roi_align import _bilinear_params
        y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(u, jnp.float32(rp))
        x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(v, jnp.float32(rp))
        acc = 0.0
        ok = (y_ok.astype(jnp.float32)[:, :, None, None]
              * x_ok.astype(jnp.float32)[None, None, :, :])
        for yi, wy in ((y_lo, wy_lo), (y_hi, wy_hi)):
            for xi, wx in ((x_lo, wx_lo), (x_hi, wx_hi)):
                vals = crop[yi[:, :, None, None], xi[None, None, :, :]]
                wgt = wy[:, :, None, None] * wx[None, None, :, :] * ok
                acc = acc + vals * wgt
        return acc.mean(axis=(1, 3))  # average the s x s samples

    return jax.vmap(one)(crops, gt_boxes, boxes)


def _project_boxes_on_masks(masks: jnp.ndarray, boxes: jnp.ndarray,
                            spatial_scale: float, out_size: int) -> jnp.ndarray:
    """RoIAlign each box over ITS OWN mask raster (torchvision
    project_masks_on_boxes): masks [P, h, w, 1], boxes [P, 4] image coords.
    Returns [P, out, out] float targets."""
    p, h, w, _ = masks.shape

    def one(mask, box):
        x1, y1, x2, y2 = box * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        s = 2  # fixed sampling ratio (tv uses adaptive ceil(bin); close)
        bins = jnp.arange(out_size, dtype=jnp.float32)
        samp = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        ys = y1 + bins[:, None] * bin_h + samp[None, :] * bin_h  # [out, s]
        xs = x1 + bins[:, None] * bin_w + samp[None, :] * bin_w
        from hnd_ghnd_tpu.ops.roi_align import _bilinear_params
        y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(
            ys, jnp.float32(h))
        x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(
            xs, jnp.float32(w))
        flat = mask[:, :, 0]
        acc = 0.0
        ok = (y_ok.astype(jnp.float32)[:, :, None, None]
              * x_ok.astype(jnp.float32)[None, None, :, :])
        for yi, wy in ((y_lo, wy_lo), (y_hi, wy_hi)):
            for xi, wx in ((x_lo, wx_lo), (x_hi, wx_hi)):
                vals = flat[yi[:, :, None, None], xi[None, None, :, :]]
                wgt = wy[:, :, None, None] * wx[None, None, :, :] * ok
                acc = acc + vals * wgt
        return acc.mean(axis=(1, 3))  # average the 2x2 samples -> [out, out]

    return jax.vmap(one)(masks, boxes)
