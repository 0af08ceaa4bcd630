"""Generalized R-CNN meta-architecture (Faster / Mask / Keypoint R-CNN).

Capability parity with the reference's CustomRCNN family
(src/models/org/rcnn.py:85-369) including its three extensions over stock
torchvision:
  * ``distill_backbone_only`` — early-return of backbone feature maps for
    HND/GHND distillation (rcnn.py:109-110);
  * ext neural-filter gating — when the filter on the bottleneck encoder
    fires, the image yields an empty prediction (rcnn.py:113-122).  Under jit
    this is a per-image *mask* (batch-safe), not a dynamic early return: the
    observable behavior (empty predictions, skipped tail compute on the edge
    device) is preserved by the split deployment, where the head program
    really does stop;
  * deterministic teacher/student resize alignment (``fixed_sizes``,
    rcnn.py:65-82) — inherently satisfied here because resizing happens in
    the host data pipeline and both models consume the identical padded
    batch.

TPU-first differences: NHWC activations; normalization fused on device;
variable image sizes become static aspect-ratio buckets; all heads are the
fixed-shape formulations in models/{rpn,roi_heads}.py.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L
from hnd_ghnd_tpu.models.bottleneck import Bottleneck4LargeResNet
from hnd_ghnd_tpu.models.fpn import FPN
from hnd_ghnd_tpu.models.resnet import ResNetBody
from hnd_ghnd_tpu.models.roi_heads import RoIConfig, RoIHeads
from hnd_ghnd_tpu.models.rpn import RPN, RPNConfig

Params = Dict[str, Any]

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


class RCNN:
    """Functional R-CNN. Params pytree paths mirror the reference:
    backbone.body.*, backbone.fpn.*, rpn.head.*, roi_heads.*."""

    def __init__(self, kind: str = "faster_rcnn", backbone_name: str = "resnet50",
                 num_classes: int = 91, bottleneck: Optional[Bottleneck4LargeResNet] = None,
                 num_keypoints: int = 17,
                 rpn_cfg: Optional[RPNConfig] = None,
                 ext_threshold: Optional[float] = None,
                 int8_roi_pool: bool = False,
                 roi_pool_impl: str = "xla",
                 kp_decode: str = "host",
                 kp_decode_grid: int = 224):
        assert kind in ("faster_rcnn", "mask_rcnn", "keypoint_rcnn")
        self.kind = kind
        self.body = ResNetBody(backbone_name, injected_layer1=bottleneck)
        self.fpn = FPN(self.body.out_channels, 256)
        self.rpn = RPN(rpn_cfg or RPNConfig())
        roi_cfg = RoIConfig(
            num_classes=num_classes,
            with_mask=(kind == "mask_rcnn"),
            with_keypoint=(kind == "keypoint_rcnn"),
            num_keypoints=num_keypoints,
            int8_pool=int8_roi_pool,
            roi_pool_impl=roi_pool_impl,
            kp_decode=kp_decode,
            kp_decode_grid=kp_decode_grid,
        )
        self.roi_heads = RoIHeads(roi_cfg)
        self.ext_threshold = ext_threshold
        self.num_classes = num_classes

    @property
    def bottleneck(self):
        return self.body.injected_layer1

    # -------------------------------------------------------------- init
    def init(self, rng) -> Tuple[Params, Params]:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        body_p, body_s = self.body.init(k1)
        params = {
            "backbone": {"body": body_p, "fpn": self.fpn.init(k2)},
            "rpn": self.rpn.init(k3),
            "roi_heads": self.roi_heads.init(k4),
        }
        state = {"backbone": {"body": body_s}}
        return params, state

    # ----------------------------------------------------------- normalize
    @staticmethod
    def normalize(images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float in [0, 1] -> standardized."""
        mean = jnp.asarray(IMAGE_MEAN, images.dtype)
        std = jnp.asarray(IMAGE_STD, images.dtype)
        return (images - mean) / std

    # ------------------------------------------------------------- backbone
    def backbone_features(self, params: Params, state: Params, images: jnp.ndarray, *,
                          training: bool, use_bottleneck_transformer: bool = False,
                          ext_training: bool = False, normalized: bool = False):
        """normalize -> trunk -> FPN. Returns (body_feats dict, fpn_feats
        list, new_state, ext_logits)."""
        x = images if normalized else self.normalize(images)
        body_feats, new_body_state, ext_logits = self.body.apply(
            params["backbone"]["body"], state["backbone"]["body"], x,
            training=training,
            use_bottleneck_transformer=use_bottleneck_transformer,
            ext_training=ext_training)
        new_state = {"backbone": {"body": new_body_state}}
        if ext_training:
            return body_feats, None, new_state, ext_logits
        fpn_feats = self.fpn.apply(
            params["backbone"]["fpn"],
            [body_feats[f"layer{i}"] for i in (1, 2, 3, 4)])
        return body_feats, fpn_feats, new_state, ext_logits

    # --------------------------------------------------------------- forward
    def forward(self, params: Params, state: Params, batch: Dict[str, jnp.ndarray], *,
                training: bool = False,
                targets: Optional[Dict[str, jnp.ndarray]] = None,
                rng: Optional[jax.Array] = None,
                distill_backbone_only: bool = False,
                ext_training: bool = False,
                use_bottleneck_transformer: bool = False):
        """Full detector forward.

        batch: {'images': [B, H, W, 3] in [0,1], 'image_sizes': [B, 2] valid
        (h, w) inside the padded bucket, 'original_sizes': [B, 2]}.

        Returns (outputs, new_state, intermediates) where intermediates maps
        reference module paths ('backbone.body.layer1', ...) to activations —
        the functional replacement for the reference's forward hooks
        (src/distillation/tool.py:19-35).
        """
        images = batch["images"]
        image_shape = (images.shape[1], images.shape[2])
        body_feats, fpn_feats, new_state, ext_logits = self.backbone_features(
            params, state, images, training=training,
            use_bottleneck_transformer=use_bottleneck_transformer,
            ext_training=ext_training)

        inter = {f"backbone.body.layer{i}": body_feats.get(f"layer{i}")
                 for i in (1, 2, 3, 4)}
        if fpn_feats is not None:
            inter["backbone.fpn"] = fpn_feats
        if ext_logits is not None:
            inter["ext_logits"] = ext_logits

        if ext_training:
            return ext_logits, new_state, inter
        if distill_backbone_only:
            return body_feats, new_state, inter

        if training:
            assert targets is not None and rng is not None
            rpn_rng, roi_rng = jax.random.split(rng)
            proposals, prop_valid, raw = self.rpn.propose(
                params["rpn"], fpn_feats, batch["image_sizes"], image_shape,
                training=True)
            rpn_losses = self.rpn.loss(raw, targets, rpn_rng)
            sampled = self.roi_heads.select_training_samples(
                proposals, prop_valid, targets, roi_rng)
            roi_losses = self.roi_heads.loss(params["roi_heads"], fpn_feats,
                                             image_shape, sampled)
            if (self.roi_heads.mask_head is not None
                    and "masks_crop" in targets):
                roi_losses.update(self.roi_heads.mask_loss(
                    params["roi_heads"], fpn_feats, image_shape, sampled,
                    targets["boxes"], targets["masks_crop"]))
            if (self.roi_heads.keypoint_head is not None
                    and "keypoints" in targets):
                roi_losses.update(self.roi_heads.keypoint_loss(
                    params["roi_heads"], fpn_feats, image_shape, sampled,
                    targets["keypoints"]))
            losses = {**roi_losses, **rpn_losses}
            return losses, new_state, inter

        proposals, prop_valid, _ = self.rpn.propose(
            params["rpn"], fpn_feats, batch["image_sizes"], image_shape,
            training=False)
        dets = self.roi_heads.infer(
            params["roi_heads"], fpn_feats, proposals, prop_valid,
            batch["image_sizes"], image_shape)

        # ext gating: mask every prediction of filtered images (the
        # reference returns a canonical empty dict for them, rcnn.py:113-122)
        if ext_logits is not None and self.ext_threshold is not None:
            pass_gate = ext_logits[:, 1] >= self.ext_threshold  # [B]
            dets["valid"] = dets["valid"] & pass_gate[:, None]
            dets["scores"] = dets["scores"] * pass_gate[:, None]
            dets["ext_logits"] = ext_logits

        # postprocess: scale boxes from padded-batch coords back to original
        # image coords (reference transform.postprocess, rcnn.py:129)
        scale = (batch["original_sizes"].astype(jnp.float32)
                 / batch["image_sizes"].astype(jnp.float32))  # [B, 2] (h, w)
        sy = scale[:, 0][:, None]
        sx = scale[:, 1][:, None]
        b = dets["boxes"]
        dets["boxes_model"] = b  # padded-batch coords, for host kp decode
        dets["boxes"] = jnp.stack(
            [b[..., 0] * sx, b[..., 1] * sy, b[..., 2] * sx, b[..., 3] * sy],
            axis=-1)
        return dets, new_state, inter
