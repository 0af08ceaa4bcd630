"""Mask / keypoint / box head golden-tensor parity vs in-test torch oracles."""
import numpy as np
import pytest
import torch
from torch import nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
from hnd_ghnd_tpu.models.roi_heads import (FastRCNNPredictor, KeypointHead,
                                           MaskHead, TwoMLPHead)


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


class TestMaskHeadParity:
    def test_mask_stack_matches_torch(self, rng):
        ncls = 7

        class TorchMaskHead(nn.Module):
            def __init__(self):
                super().__init__()
                self.mask_fcn1 = nn.Conv2d(256, 256, 3, padding=1)
                self.mask_fcn2 = nn.Conv2d(256, 256, 3, padding=1)
                self.mask_fcn3 = nn.Conv2d(256, 256, 3, padding=1)
                self.mask_fcn4 = nn.Conv2d(256, 256, 3, padding=1)
                self.conv5_mask = nn.ConvTranspose2d(256, 256, 2, 2, 0)
                self.mask_fcn_logits = nn.Conv2d(256, ncls, 1)

            def forward(self, x):
                for i in (1, 2, 3, 4):
                    x = F.relu(getattr(self, f"mask_fcn{i}")(x))
                x = F.relu(self.conv5_mask(x))
                return self.mask_fcn_logits(x)

        tm = TorchMaskHead().eval()
        sd = {}
        for k, v in tm.state_dict().items():
            prefix = ("roi_heads.mask_predictor"
                      if k.startswith(("conv5_mask", "mask_fcn_logits"))
                      else "roi_heads.mask_head")
            sd[f"{prefix}.{k}"] = v
        p_up, _ = convert_state_dict(sd)

        head = MaskHead(256, ncls)
        params = head.init(jax.random.PRNGKey(0))
        params = merge_pytree({"roi_heads": {"mask_head": params}},
                              p_up)["roi_heads"]["mask_head"]

        x = rng.randn(3, 256, 14, 14).astype(np.float32) * 0.5
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = head.apply(params, jnp.asarray(to_nhwc(x)))
        assert got.shape == (3, 28, 28, ncls)
        np.testing.assert_allclose(to_nchw(got), want, rtol=1e-3, atol=1e-4)


class TestKeypointHeadParity:
    def test_keypoint_stack_matches_torch(self, rng):
        k = 17
        layers = []
        for i in range(8):
            layers.append(nn.Conv2d(256 if i == 0 else 512, 512, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
        torch_head = nn.Sequential(*layers).eval()
        predictor = nn.ConvTranspose2d(512, k, 4, 2, 1).eval()

        sd = {}
        for name, v in torch_head.state_dict().items():
            sd[f"roi_heads.keypoint_head.{name}"] = v
        for name, v in predictor.state_dict().items():
            sd[f"roi_heads.keypoint_predictor.kps_score_lowres.{name}"] = v
        p_up, _ = convert_state_dict(sd)

        head = KeypointHead(256, k)
        params = head.init(jax.random.PRNGKey(1))
        params = merge_pytree({"roi_heads": {"keypoint_head": params}},
                              p_up)["roi_heads"]["keypoint_head"]

        x = rng.randn(2, 256, 14, 14).astype(np.float32) * 0.3
        with torch.no_grad():
            z = torch_head(torch.from_numpy(x))
            z = predictor(z)
            want = F.interpolate(z, scale_factor=2, mode="bilinear",
                                 align_corners=False).numpy()
        got = head.apply(params, jnp.asarray(to_nhwc(x)))
        assert got.shape == (2, 56, 56, k)
        np.testing.assert_allclose(to_nchw(got), want, rtol=1e-3, atol=1e-3)


class TestBoxHeadParity:
    def test_two_mlp_and_predictor_match_torch(self, rng):
        fc6 = nn.Linear(256 * 7 * 7, 1024).eval()
        fc7 = nn.Linear(1024, 1024).eval()
        cls_score = nn.Linear(1024, 11).eval()
        bbox_pred = nn.Linear(1024, 44).eval()
        sd = {}
        for mod, name in ((fc6, "roi_heads.box_head.fc6"),
                          (fc7, "roi_heads.box_head.fc7"),
                          (cls_score, "roi_heads.box_predictor.cls_score"),
                          (bbox_pred, "roi_heads.box_predictor.bbox_pred")):
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v
        p_up, _ = convert_state_dict(sd)

        head = TwoMLPHead(256 * 7 * 7, 1024)
        pred = FastRCNNPredictor(1024, 11)
        hp = merge_pytree(
            {"roi_heads": {"box_head": head.init(jax.random.PRNGKey(2))}},
            p_up)["roi_heads"]["box_head"]
        pp = merge_pytree(
            {"roi_heads": {"box_predictor": pred.init(jax.random.PRNGKey(3))}},
            p_up)["roi_heads"]["box_predictor"]

        x = rng.randn(5, 256, 7, 7).astype(np.float32) * 0.2
        with torch.no_grad():
            rep = F.relu(fc7(F.relu(fc6(torch.from_numpy(x).flatten(1)))))
            want_cls = cls_score(rep).numpy()
            want_box = bbox_pred(rep).numpy()
        rep_j = head.apply(hp, jnp.asarray(to_nhwc(x)))
        got_cls, got_box = pred.apply(pp, rep_j)
        np.testing.assert_allclose(np.asarray(got_cls), want_cls,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_box), want_box,
                                   rtol=1e-3, atol=1e-4)
