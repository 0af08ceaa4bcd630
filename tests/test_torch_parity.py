"""Numerical parity of the functional layers against torch (CPU) oracles.

These pin the exact semantics the weight converter (models/convert.py)
assumes: NHWC<->NCHW transposes, BN folding, flatten ordering, transposed
conv geometry.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L


def to_nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.fixture
def x(rng):
    return rng.randn(2, 8, 14, 18).astype(np.float32)  # NCHW


class TestConvParity:
    @pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 3, 7),
                                                  (1, 1, 2), (2, 0, 1)])
    def test_conv2d(self, rng, x, stride, padding, k):
        w = rng.randn(6, 8, k, k).astype(np.float32) * 0.1  # OIHW
        b = rng.randn(6).astype(np.float32)
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                        torch.from_numpy(b), stride=stride,
                        padding=padding).numpy()
        got = L.conv2d({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "b": jnp.asarray(b)},
                       jnp.asarray(to_nhwc(x)), stride=stride,
                       padding=padding)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("stride,padding,k", [(2, 0, 2), (2, 1, 4)])
    def test_conv_transpose2d(self, rng, x, stride, padding, k):
        w = rng.randn(8, 5, k, k).astype(np.float32) * 0.1  # (in, out, kh, kw)
        b = rng.randn(5).astype(np.float32)
        want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                  torch.from_numpy(b), stride=stride,
                                  padding=padding).numpy()
        got = L.conv_transpose2d({"w": jnp.asarray(w.transpose(2, 3, 0, 1)),
                                  "b": jnp.asarray(b)},
                                 jnp.asarray(to_nhwc(x)), stride=stride,
                                 padding=padding)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_grouped_conv(self, rng):
        from hnd_ghnd_tpu.models.resnet import _grouped_conv
        x = rng.randn(1, 16, 10, 10).astype(np.float32)
        w = rng.randn(32, 4, 3, 3).astype(np.float32) * 0.1  # groups=4
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                        padding=1, groups=4).numpy()
        got = _grouped_conv({"w": jnp.asarray(w.transpose(2, 3, 1, 0))},
                            jnp.asarray(to_nhwc(x)), 1, 1, 4)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-4)


class TestNormPoolParity:
    def test_frozen_bn_fold_matches_torch_eval_bn(self, rng, x):
        c = x.shape[1]
        weight = rng.rand(c).astype(np.float32) + 0.5
        bias = rng.randn(c).astype(np.float32)
        mean = rng.randn(c).astype(np.float32)
        var = rng.rand(c).astype(np.float32) + 0.5
        want = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                            torch.from_numpy(var), torch.from_numpy(weight),
                            torch.from_numpy(bias), training=False,
                            eps=0.0).numpy()
        folded = L.fold_bn_stats(weight, bias, mean, var, eps=0.0)
        got = L.frozen_bn(folded, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_batch_norm_train_and_running_stats(self, rng, x):
        c = x.shape[1]
        tbn = torch.nn.BatchNorm2d(c)
        tbn.train()
        with torch.no_grad():
            want = tbn(torch.from_numpy(x)).numpy()
        params = {"gamma": jnp.ones(c), "beta": jnp.zeros(c)}
        state = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
        got, new_state = L.batch_norm(params, state, jnp.asarray(to_nhwc(x)),
                                      training=True)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state["mean"]),
                                   tbn.running_mean.numpy(), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state["var"]),
                                   tbn.running_var.numpy(), rtol=1e-4,
                                   atol=1e-5)

    def test_max_pool(self, rng, x):
        want = F.max_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
        got = L.max_pool(jnp.asarray(to_nhwc(x)), 3, 2, 1)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want)

    @pytest.mark.parametrize("out_hw", [(8, 8), (64, 64), (5, 7)])
    def test_adaptive_avg_pool(self, rng, out_hw):
        x = rng.randn(2, 6, 37, 53).astype(np.float32)
        want = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
        got = L.adaptive_avg_pool(jnp.asarray(to_nhwc(x)), out_hw)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-5)

    def test_linear_channel_major_flatten(self, rng):
        # torch: flatten [N, C, H, W] -> [N, C*H*W] then Linear
        x = rng.randn(3, 4, 5, 5).astype(np.float32)
        w = rng.randn(7, 100).astype(np.float32) * 0.1
        b = rng.randn(7).astype(np.float32)
        want = (torch.from_numpy(x).flatten(1) @ torch.from_numpy(w).T
                + torch.from_numpy(b)).numpy()
        xh = jnp.asarray(to_nhwc(x))
        flat = jnp.transpose(xh, (0, 3, 1, 2)).reshape(3, -1)
        got = L.linear({"w": jnp.asarray(w.T), "b": jnp.asarray(b)}, flat)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-4)


class TestConverter:
    def test_resnet_trunk_statedict_conversion(self, rng):
        """Synthetic torch state_dict with reference paths -> our pytree;
        numerics via a single converted conv+bn applied to data."""
        from hnd_ghnd_tpu.models.convert import convert_state_dict
        sd = {
            "backbone.body.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
            "backbone.body.bn1.weight": rng.rand(64).astype(np.float32) + 0.5,
            "backbone.body.bn1.bias": rng.randn(64).astype(np.float32),
            "backbone.body.bn1.running_mean": rng.randn(64).astype(np.float32),
            "backbone.body.bn1.running_var": rng.rand(64).astype(np.float32) + 0.5,
            "backbone.body.layer2.0.conv1.weight": rng.randn(128, 256, 1, 1).astype(np.float32),
            "backbone.body.layer2.0.downsample.0.weight": rng.randn(512, 256, 1, 1).astype(np.float32),
            "backbone.fpn.inner_blocks.0.weight": rng.randn(256, 256, 1, 1).astype(np.float32),
            "backbone.fpn.inner_blocks.0.bias": rng.randn(256).astype(np.float32),
            "rpn.head.conv.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
            "rpn.head.conv.bias": rng.randn(256).astype(np.float32),
            "roi_heads.box_head.fc6.weight": rng.randn(1024, 12544).astype(np.float32),
            "roi_heads.box_head.fc6.bias": rng.randn(1024).astype(np.float32),
            "roi_heads.box_predictor.cls_score.weight": rng.randn(91, 1024).astype(np.float32),
            "roi_heads.box_predictor.cls_score.bias": rng.randn(91).astype(np.float32),
            # bottleneck encoder conv + BN (trainable BN -> params + state)
            "backbone.body.layer1.encoder.encoder.0.weight": rng.randn(64, 64, 2, 2).astype(np.float32),
            "backbone.body.layer1.encoder.encoder.1.weight": rng.rand(64).astype(np.float32),
            "backbone.body.layer1.encoder.encoder.1.bias": rng.randn(64).astype(np.float32),
            "backbone.body.layer1.encoder.encoder.1.running_mean": rng.randn(64).astype(np.float32),
            "backbone.body.layer1.encoder.encoder.1.running_var": rng.rand(64).astype(np.float32) + 0.5,
            "backbone.body.layer1.decoder.0.weight": rng.rand(3).astype(np.float32),
            "backbone.body.layer1.decoder.0.bias": rng.randn(3).astype(np.float32),
            "backbone.body.layer1.decoder.0.running_mean": rng.randn(3).astype(np.float32),
            "backbone.body.layer1.decoder.0.running_var": rng.rand(3).astype(np.float32) + 0.5,
            "roi_heads.keypoint_head.0.weight": rng.randn(512, 256, 3, 3).astype(np.float32),
            "roi_heads.keypoint_head.2.weight": rng.randn(512, 512, 3, 3).astype(np.float32),
            "roi_heads.keypoint_predictor.kps_score_lowres.weight": rng.randn(512, 17, 4, 4).astype(np.float32),
            "roi_heads.mask_predictor.conv5_mask.weight": rng.randn(256, 256, 2, 2).astype(np.float32),
        }
        params, state = convert_state_dict(sd)
        assert params["backbone"]["body"]["conv1"]["w"].shape == (7, 7, 3, 64)
        assert "scale" in params["backbone"]["body"]["bn1"]
        assert params["backbone"]["body"]["layer2"]["0"]["downsample"]["0"]["w"].shape == (1, 1, 256, 512)
        assert params["roi_heads"]["box_head"]["fc6"]["w"].shape == (12544, 1024)
        # trainable BN split into params/state
        enc_bn = params["backbone"]["body"]["layer1"]["encoder"]["bn0"]
        assert "gamma" in enc_bn
        assert "mean" in state["backbone"]["body"]["layer1"]["encoder"]["bn0"]
        assert "bn_in" in params["backbone"]["body"]["layer1"]["decoder"]
        # keypoint sequential index 2 -> our conv "1"
        assert params["roi_heads"]["keypoint_head"]["1"]["w"].shape == (3, 3, 512, 512)
        assert params["roi_heads"]["keypoint_head"]["kps_score_lowres"]["w"].shape == (4, 4, 512, 17)
        assert params["roi_heads"]["mask_head"]["conv5_mask"]["w"].shape == (2, 2, 256, 256)

        # folded BN numerics match torch eval BN
        x = np.random.RandomState(1).randn(1, 64, 4, 4).astype(np.float32)
        want = F.batch_norm(
            torch.from_numpy(x),
            torch.from_numpy(sd["backbone.body.bn1.running_mean"]),
            torch.from_numpy(sd["backbone.body.bn1.running_var"]),
            torch.from_numpy(sd["backbone.body.bn1.weight"]),
            torch.from_numpy(sd["backbone.body.bn1.bias"]),
            training=False, eps=0.0).numpy()
        got = L.frozen_bn(params["backbone"]["body"]["bn1"],
                          jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_merge_into_real_model(self, rng):
        """Converted teacher weights merge non-strictly into a student."""
        from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
        from hnd_ghnd_tpu.models.factory import build_model
        import jax
        student = build_model({
            "name": "faster_rcnn",
            "backbone": {"name": "custom_resnet50",
                         "params": {"pretrained": False,
                                    "freeze_layers": False,
                                    "layer1": {"name": "Bottleneck4LargeResNet",
                                               "bottleneck_channel": 3}}},
            "params": {"num_classes": 91},
        })
        params, _ = student.init(jax.random.PRNGKey(0))
        w = rng.randn(64, 3, 7, 7).astype(np.float32)
        sd = {"backbone.body.conv1.weight": w,
              # layer1 of a stock teacher has no counterpart in the student
              "backbone.body.layer1.0.conv1.weight":
                  rng.randn(64, 64, 1, 1).astype(np.float32)}
        p_up, _ = convert_state_dict(sd)
        merged = merge_pytree(params, p_up)
        np.testing.assert_allclose(
            np.asarray(merged["backbone"]["body"]["conv1"]["w"]),
            w.transpose(2, 3, 1, 0))
        # bottleneck params untouched
        assert "encoder" in merged["backbone"]["body"]["layer1"]
