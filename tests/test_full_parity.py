"""FULL-PIPELINE golden parity: composed detector vs a torch-built oracle.

Per-stack parity (test_resnet_parity / test_fpn_parity / test_head_parity /
test_torch_parity) pins every stage in isolation; this test pins the WIRING:
stem -> trunk -> FPN -> RPN head -> per-level top-k -> decode -> clip ->
small-box filter -> level-categorized NMS -> post-NMS top-k -> multi-scale
RoIAlign level routing -> box head -> class softmax -> box decode (10,10,5,5)
+ clamp -> score threshold -> per-class NMS -> top-100 -> resize-to-original
postprocess.

The oracle assembles the reference detector in plain torch from its published
composition (/root/reference/src/models/org/rcnn.py:85-229, which delegates
to torchvision 0.4.2 RPN/RoIHeads/MultiScaleRoIAlign semantics), pushes its
random weights through models/convert.py, and requires eval-mode agreement on
RPN proposals and final detections for a fixed input.  Any drift in top-k
order, NMS tie-breaks, level routing, or decode clamps fails here.
"""
import math

import numpy as np
import pytest
import torch
from torch import nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
from hnd_ghnd_tpu.models.rcnn import RCNN, IMAGE_MEAN, IMAGE_STD
from tests.oracles import greedy_nms, roi_align_one_level

pytestmark = pytest.mark.slow

NCLS = 5  # small class count so random-weight softmax scores clear the 0.05
          # threshold and the class-NMS path is actually exercised

BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


# ---------------------------------------------------------------------------
# torch oracle modules (torchvision state-dict names, eval-mode BN eps=0
# == the reference's FrozenBatchNorm2d fold)
# ---------------------------------------------------------------------------

class TorchBottleneckBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, eps=0.0)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, eps=0.0)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4, eps=0.0)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4, eps=0.0))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TorchResNet50Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=0.0)
        planes = (64, 128, 256, 512)
        counts = (3, 4, 6, 3)
        inplanes = 64
        for li, (p, n) in enumerate(zip(planes, counts), start=1):
            blocks = [TorchBottleneckBlock(
                inplanes, p, stride=(1 if li == 1 else 2), downsample=True)]
            inplanes = p * 4
            blocks += [TorchBottleneckBlock(inplanes, p) for _ in range(n - 1)]
            setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        feats = []
        for li in (1, 2, 3, 4):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


class TorchFPN(nn.Module):
    def __init__(self, in_channels, out_channels=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1) for c in in_channels])
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1)
             for _ in in_channels])

    def forward(self, feats):
        last = self.inner_blocks[-1](feats[-1])
        outs = [self.layer_blocks[-1](last)]
        for i in range(len(feats) - 2, -1, -1):
            inner = self.inner_blocks[i](feats[i])
            last = inner + F.interpolate(last, size=inner.shape[-2:],
                                         mode="nearest")
            outs.insert(0, self.layer_blocks[i](last))
        outs.append(F.max_pool2d(outs[-1], 1, 2, 0))
        return outs


class TorchRPNHead(nn.Module):
    def __init__(self, in_channels=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.cls_logits = nn.Conv2d(in_channels, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(in_channels, num_anchors * 4, 1)

    def forward(self, feats):
        obj, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            obj.append(self.cls_logits(t))
            deltas.append(self.bbox_pred(t))
        return obj, deltas


class TorchDetector(nn.Module):
    """Shell whose state_dict keys are exactly the torchvision names the
    checkpoint converter maps (backbone.body.*, backbone.fpn.*, rpn.head.*,
    roi_heads.box_head/box_predictor.*)."""

    def __init__(self):
        super().__init__()
        self.backbone = nn.Module()
        self.backbone.body = TorchResNet50Body()
        self.backbone.fpn = TorchFPN([256, 512, 1024, 2048])
        self.rpn = nn.Module()
        self.rpn.head = TorchRPNHead()
        self.roi_heads = nn.Module()
        self.roi_heads.box_head = nn.Module()
        self.roi_heads.box_head.fc6 = nn.Linear(256 * 7 * 7, 1024)
        self.roi_heads.box_head.fc7 = nn.Linear(1024, 1024)
        self.roi_heads.box_predictor = nn.Module()
        self.roi_heads.box_predictor.cls_score = nn.Linear(1024, NCLS)
        self.roi_heads.box_predictor.bbox_pred = nn.Linear(1024, NCLS * 4)


def randomize_weights(model: nn.Module, rng: np.random.RandomState):
    """Deterministic, numerically-tame random weights: kaiming-scale convs,
    near-identity BN running stats, score-spreading classifier."""
    for name, m in model.named_modules():
        if isinstance(m, nn.Conv2d):
            fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
            std = math.sqrt(2.0 / fan_in)
            if "rpn" in name:
                std = 0.01
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(
                    rng.randn(*m.weight.shape).astype(np.float32) * std))
                if m.bias is not None:
                    m.bias.copy_(torch.from_numpy(
                        rng.randn(*m.bias.shape).astype(np.float32) * 0.01))
        elif isinstance(m, nn.BatchNorm2d):
            # residual-branch output BNs (bn3) get small scales so the trunk
            # variance doesn't double per block (random kaiming weights have
            # no trained downscaling) — keeps activations O(1) through 16
            # blocks so parity tolerances are meaningful
            w_lo, w_hi = (0.1, 0.3) if name.endswith("bn3") else (0.9, 1.1)
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) * 0.4 + 0.8))
                m.weight.copy_(torch.from_numpy(
                    (rng.rand(m.num_features).astype(np.float32)
                     * (w_hi - w_lo) + w_lo)))
                m.bias.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.05))
        elif isinstance(m, nn.Linear):
            std = 0.01
            bias_std = 0.01
            if name.endswith("cls_score"):
                std, bias_std = 0.05, 0.5  # spread softmax scores past 0.05
            elif name.endswith("bbox_pred"):
                std, bias_std = 0.003, 0.001
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(
                    rng.randn(*m.weight.shape).astype(np.float32) * std))
                m.bias.copy_(torch.from_numpy(
                    rng.randn(*m.bias.shape).astype(np.float32) * bias_std))


# ---------------------------------------------------------------------------
# numpy oracle for the detection pipeline around the torch compute
# ---------------------------------------------------------------------------

def decode_np(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def clip_np(boxes, hw):
    h, w = hw
    out = boxes.copy()
    out[..., 0] = np.clip(boxes[..., 0], 0, w)
    out[..., 1] = np.clip(boxes[..., 1], 0, h)
    out[..., 2] = np.clip(boxes[..., 2], 0, w)
    out[..., 3] = np.clip(boxes[..., 3], 0, h)
    return out


def grid_anchors_np(grid_sizes, image_size):
    """torchvision AnchorGenerator: rounded zero-centered templates on a
    stride grid, position-major / anchor-minor."""
    sizes = ((32,), (64,), (128,), (256,), (512,))
    ratios = (0.5, 1.0, 2.0)
    out = []
    for (gh, gw), lvl_sizes in zip(grid_sizes, sizes):
        scales = np.asarray(lvl_sizes, np.float32)
        r = np.asarray(ratios, np.float32)
        h_r = np.sqrt(r)
        w_r = 1.0 / h_r
        ws = (w_r[:, None] * scales[None]).reshape(-1)
        hs = (h_r[:, None] * scales[None]).reshape(-1)
        base = np.round(np.stack([-ws, -hs, ws, hs], 1) / 2.0)
        stride_h = image_size[0] / gh
        stride_w = image_size[1] / gw
        shift_x = np.arange(gw, dtype=np.float32) * stride_w
        shift_y = np.arange(gh, dtype=np.float32) * stride_h
        sx, syy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx, syy, sx, syy], -1).reshape(-1, 1, 4)
        out.append((shifts + base[None]).reshape(-1, 4).astype(np.float32))
    return out


def batched_nms_np(boxes, scores, idxs, thresh):
    """torchvision batched_nms: coordinate-offset trick + plain NMS."""
    if len(boxes) == 0:
        return np.zeros(0, dtype=np.int64)
    max_coord = boxes.max()
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1)
    return np.asarray(greedy_nms(boxes + offsets[:, None], scores, thresh))


def oracle_rpn_filter(boxes_lvls, scores_lvls, image_hw,
                      pre_nms=1000, post_nms=1000, nms_thresh=0.7,
                      min_size=1e-3):
    """torchvision 0.4.2 RegionProposalNetwork.filter_proposals."""
    bx, sc, lv = [], [], []
    for li, (b, s) in enumerate(zip(boxes_lvls, scores_lvls)):
        k = min(pre_nms, len(s))
        idx = np.argsort(-s, kind="stable")[:k]
        bx.append(b[idx])
        sc.append(s[idx])
        lv.append(np.full(k, li, np.int64))
    boxes = np.concatenate(bx)
    scores = np.concatenate(sc)
    lvls = np.concatenate(lv)
    boxes = clip_np(boxes, image_hw)
    keep = ((boxes[:, 2] - boxes[:, 0]) >= min_size) & \
           ((boxes[:, 3] - boxes[:, 1]) >= min_size)
    boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
    keep = batched_nms_np(boxes, scores, lvls, nms_thresh)[:post_nms]
    return boxes[keep], scores[keep]


def oracle_multiscale_roi_align(feats_nhwc, rois, image_hw, out_size):
    """torchvision 0.4.2 MultiScaleRoIAlign: LevelMapper + legacy roi_align."""
    scales = [2.0 ** np.round(np.log2(f.shape[0] / float(image_hw[0])))
              for f in feats_nhwc]
    areas = np.maximum(rois[:, 2] - rois[:, 0], 0) * \
        np.maximum(rois[:, 3] - rois[:, 1], 0)
    lvls = np.floor(4 + np.log2(np.sqrt(areas) / 224.0 + 1e-6))
    lvls = np.clip(lvls, 2, 5).astype(np.int64) - 2
    pooled = np.zeros((len(rois), out_size, out_size, feats_nhwc[0].shape[-1]),
                      np.float32)
    for li, (f, sc) in enumerate(zip(feats_nhwc, scales)):
        m = lvls == li
        if m.any():
            pooled[m] = roi_align_one_level(f, rois[m], sc, out_size, 2)
    return pooled


def oracle_postprocess_detections(cls_logits, box_deltas, proposals, image_hw,
                                  score_thresh=0.05, nms_thresh=0.5,
                                  detections_per_img=100):
    """torchvision 0.4.2 RoIHeads.postprocess_detections."""
    scores = torch.softmax(torch.from_numpy(cls_logits), -1).numpy()
    r = len(proposals)
    boxes = decode_np(box_deltas.reshape(r, NCLS, 4), proposals[:, None],
                      (10.0, 10.0, 5.0, 5.0))
    boxes = clip_np(boxes, image_hw)
    boxes = boxes[:, 1:].reshape(-1, 4)
    scores = scores[:, 1:].reshape(-1)
    labels = np.tile(np.arange(1, NCLS), r)
    inds = scores > score_thresh
    boxes, scores, labels = boxes[inds], scores[inds], labels[inds]
    keep = ((boxes[:, 2] - boxes[:, 0]) >= 1e-2) & \
           ((boxes[:, 3] - boxes[:, 1]) >= 1e-2)
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    keep = batched_nms_np(boxes, scores, labels, nms_thresh)
    keep = keep[:detections_per_img]
    return boxes[keep], scores[keep], labels[keep]


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def assert_box_sets_match(got_boxes, want_boxes, atol, msg,
                          got_extra=None, want_extra=None, extra_atol=None):
    """1-1 match boxes by nearest L-inf distance (score sort order can
    legally swap for near-tie scores across frameworks; the SET of outputs
    must agree exactly).  Optionally checks per-match extras (scores)."""
    assert len(got_boxes) == len(want_boxes), \
        f"{msg}: count {len(got_boxes)} != {len(want_boxes)}"
    if len(want_boxes) == 0:
        return
    dist = np.max(np.abs(got_boxes[None] - want_boxes[:, None]), axis=-1)
    used = np.zeros(len(got_boxes), bool)
    for i in np.argsort(dist.min(axis=1)):
        j = int(np.argmin(np.where(used, np.inf, dist[i])))
        assert dist[i, j] < atol, \
            f"{msg}: oracle box {i} has no match within {atol} " \
            f"(best {dist[i, j]:.4f})"
        used[j] = True
        if want_extra is not None:
            np.testing.assert_allclose(
                got_extra[j], want_extra[i], atol=extra_atol,
                err_msg=f"{msg}: extras mismatch for matched pair {i}->{j}")


class TestFullPipelineParity:
    def test_composed_eval_matches_torch_oracle(self, rng):
        H, W = 256, 320              # padded bucket (stride-64 aligned)
        img_h, img_w = 250, 310      # valid (resized) size inside the bucket
        orig_h, orig_w = 125, 155    # original image size

        tm = TorchDetector()
        randomize_weights(tm, rng)
        tm.eval()

        # ---- convert weights into our model -----------------------------
        sd = {k: v for k, v in tm.state_dict().items()}
        p_up, s_up = convert_state_dict(sd)
        model = RCNN(kind="faster_rcnn", num_classes=NCLS)
        params, state = model.init(jax.random.PRNGKey(0))
        params = merge_pytree(params, p_up)
        state = merge_pytree(state, s_up)

        # ---- shared input ------------------------------------------------
        img = rng.rand(1, 3, H, W).astype(np.float32)
        img[:, :, img_h:, :] = 0.0
        img[:, :, :, img_w:] = 0.0
        mean = np.asarray(IMAGE_MEAN, np.float32).reshape(1, 3, 1, 1)
        std = np.asarray(IMAGE_STD, np.float32).reshape(1, 3, 1, 1)
        x_norm = (img - mean) / std

        # ---- torch oracle forward -----------------------------------------
        with torch.no_grad():
            body_feats = tm.backbone.body(torch.from_numpy(x_norm))
            fpn_feats_t = tm.backbone.fpn(body_feats)
            obj_t, deltas_t = tm.rpn.head(fpn_feats_t)
        fpn_feats_np = [to_nhwc(f.numpy())[0] for f in fpn_feats_t]
        grid_sizes = [(f.shape[0], f.shape[1]) for f in fpn_feats_np]
        anchors = grid_anchors_np(grid_sizes, (H, W))

        boxes_lvls, scores_lvls = [], []
        for li in range(5):
            o = obj_t[li].numpy()[0]                     # [A, h, w]
            d = deltas_t[li].numpy()[0]                  # [4A, h, w]
            a, h, w = o.shape
            o_flat = o.transpose(1, 2, 0).reshape(-1)    # (h, w, a)
            d_flat = d.reshape(a, 4, h, w).transpose(2, 3, 0, 1).reshape(-1, 4)
            boxes_lvls.append(decode_np(d_flat, anchors[li]))
            scores_lvls.append(o_flat)

        want_props, want_prop_scores = oracle_rpn_filter(
            boxes_lvls, scores_lvls, (img_h, img_w))

        pooled = oracle_multiscale_roi_align(
            fpn_feats_np[:4], want_props, (H, W), 7)
        with torch.no_grad():
            flat = torch.from_numpy(
                pooled.transpose(0, 3, 1, 2).reshape(len(pooled), -1))
            rep = F.relu(tm.roi_heads.box_head.fc7(
                F.relu(tm.roi_heads.box_head.fc6(flat))))
            cls_logits = tm.roi_heads.box_predictor.cls_score(rep).numpy()
            box_deltas = tm.roi_heads.box_predictor.bbox_pred(rep).numpy()
        want_boxes, want_scores, want_labels = oracle_postprocess_detections(
            cls_logits, box_deltas, want_props, (img_h, img_w))
        # postprocess: resize to original coords
        sy, sx = orig_h / img_h, orig_w / img_w
        want_boxes = want_boxes * np.asarray([sx, sy, sx, sy], np.float32)

        # ---- our model forward -------------------------------------------
        batch = {
            "images": jnp.asarray(to_nhwc(img)),
            "image_sizes": jnp.asarray([[img_h, img_w]], jnp.int32),
            "original_sizes": jnp.asarray([[orig_h, orig_w]], jnp.int32),
        }
        # intermediate: proposals (through the real backbone+rpn path)
        _, fpn_j, _, _ = model.backbone_features(
            params, state, batch["images"], training=False)
        for li in range(5):
            np.testing.assert_allclose(
                np.asarray(fpn_j[li])[0], fpn_feats_np[li],
                rtol=1e-3, atol=1e-3,
                err_msg=f"FPN level {li} diverged")
        props_j, props_valid, _ = model.rpn.propose(
            params["rpn"], fpn_j, batch["image_sizes"], (H, W),
            training=False)
        got_props = np.asarray(props_j)[0][np.asarray(props_valid)[0]]
        assert_box_sets_match(got_props, want_props, atol=0.1,
                              msg="RPN proposals")
        # score-descending order must agree up to near-tie swaps: the sorted
        # score sequences themselves are directly comparable
        got_order = np.sort(got_props, axis=0)
        want_order = np.sort(want_props, axis=0)
        np.testing.assert_allclose(got_order, want_order, atol=0.1)

        dets, _, _ = model.forward(params, state, batch, training=False)
        valid = np.asarray(dets["valid"])[0]
        got_boxes = np.asarray(dets["boxes"])[0][valid]
        got_scores = np.asarray(dets["scores"])[0][valid]
        got_labels = np.asarray(dets["labels"])[0][valid]

        assert len(want_boxes) > 0, "vacuous test: oracle found no detections"
        assert_box_sets_match(
            got_boxes, want_boxes, atol=0.1, msg="final detections",
            got_extra=np.c_[got_scores, got_labels.astype(np.float64)],
            want_extra=np.c_[want_scores, want_labels.astype(np.float64)],
            extra_atol=1e-3)
