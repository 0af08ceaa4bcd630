"""Composite-architecture parity vs torch oracles built in-test.

The individual primitives are torch-parity-tested (test_torch_parity.py);
these tests assemble the reference's composite stacks in plain torch
(conv/BN orderings exactly as published), push their weights through the
checkpoint converter, and require our functional modules to reproduce the
torch outputs — golden-tensor evidence that the architecture wiring
(BN placement, ReLU placement, flatten order, deconv geometry) is right.
"""
import numpy as np
import pytest
import torch
from torch import nn
import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models.bottleneck import Bottleneck4LargeResNet
from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
from hnd_ghnd_tpu.models.ext import Ext4ResNet


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def torch_bottleneck_encoder(bch):
    return nn.Sequential(
        nn.Conv2d(64, 64, kernel_size=2, padding=1, bias=False),
        nn.BatchNorm2d(64),
        nn.Conv2d(64, 256, kernel_size=2, padding=1, bias=False),
        nn.BatchNorm2d(256),
        nn.ReLU(inplace=True),
        nn.Conv2d(256, 64, kernel_size=2, padding=1, bias=False),
        nn.BatchNorm2d(64),
        nn.Conv2d(64, bch, kernel_size=2, padding=1, bias=False),
    )


def torch_bottleneck_decoder(bch):
    return nn.Sequential(
        nn.BatchNorm2d(bch),
        nn.ReLU(inplace=True),
        nn.Conv2d(bch, 64, kernel_size=2, bias=False),
        nn.BatchNorm2d(64),
        nn.Conv2d(64, 128, kernel_size=2, bias=False),
        nn.BatchNorm2d(128),
        nn.ReLU(inplace=True),
        nn.Conv2d(128, 256, kernel_size=2, bias=False),
        nn.BatchNorm2d(256),
        nn.Conv2d(256, 256, kernel_size=2, bias=False),
        nn.BatchNorm2d(256),
        nn.ReLU(inplace=True),
    )


def randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.weight.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))


class TestBottleneckParity:
    def test_encoder_decoder_eval_outputs_match_torch(self, rng):
        bch = 3
        enc = torch_bottleneck_encoder(bch)
        dec = torch_bottleneck_decoder(bch)
        randomize_bn_stats(enc, rng)
        randomize_bn_stats(dec, rng)
        enc.eval()
        dec.eval()

        sd = {}
        for k, v in enc.state_dict().items():
            sd[f"backbone.body.layer1.encoder.encoder.{k}"] = v
        for k, v in dec.state_dict().items():
            sd[f"backbone.body.layer1.decoder.{k}"] = v
        p_up, s_up = convert_state_dict(sd)

        bott = Bottleneck4LargeResNet(bch)
        params, state = bott.init(jax.random.PRNGKey(0))
        params = merge_pytree(
            {"backbone": {"body": {"layer1": params}}},
            p_up)["backbone"]["body"]["layer1"]
        state = merge_pytree(
            {"backbone": {"body": {"layer1": state}}},
            s_up)["backbone"]["body"]["layer1"]

        x = rng.randn(1, 64, 16, 20).astype(np.float32)
        with torch.no_grad():
            want_z = enc(torch.from_numpy(x)).numpy()
            want_y = dec(torch.from_numpy(want_z)).numpy()

        z, _ = bott.encode(params, state, jnp.asarray(to_nhwc(x)),
                           training=False)
        np.testing.assert_allclose(to_nchw(z), want_z, rtol=1e-3, atol=1e-4)
        y, _ = bott.decode(params, state, z, training=False)
        np.testing.assert_allclose(to_nchw(y), want_y, rtol=1e-3, atol=1e-3)


class TestExtParity:
    def test_ext_classifier_matches_torch(self, rng):
        class TorchExt(nn.Module):
            def __init__(self, cin):
                super().__init__()
                self.extractor = nn.Sequential(
                    nn.AdaptiveAvgPool2d((64, 64)),
                    nn.Conv2d(cin, 64, kernel_size=4, stride=2),
                    nn.BatchNorm2d(64), nn.ReLU(inplace=True),
                    nn.Conv2d(64, 32, kernel_size=3, stride=2),
                    nn.BatchNorm2d(32), nn.ReLU(inplace=True),
                    nn.Conv2d(32, 16, kernel_size=2, stride=1),
                    nn.BatchNorm2d(16), nn.ReLU(inplace=True),
                    nn.AdaptiveAvgPool2d((8, 8)))
                self.linear = nn.Linear(16 * 8 * 8, 2)

            def forward(self, x):
                z = self.extractor(x)
                return self.linear(z.flatten(1)).softmax(dim=1)

        tmodel = TorchExt(64)
        randomize_bn_stats(tmodel, rng)
        tmodel.eval()
        sd = {}
        for k, v in tmodel.state_dict().items():
            sd[f"backbone.body.layer1.encoder.ext_classifier.{k}"] = v
        p_up, s_up = convert_state_dict(sd)

        ext = Ext4ResNet(64)
        params, state = ext.init(jax.random.PRNGKey(1))
        params = merge_pytree(
            {"backbone": {"body": {"layer1": {"ext_classifier": params}}}},
            p_up)["backbone"]["body"]["layer1"]["ext_classifier"]
        state = merge_pytree(
            {"backbone": {"body": {"layer1": {"ext_classifier": state}}}},
            s_up)["backbone"]["body"]["layer1"]["ext_classifier"]

        x = rng.randn(2, 64, 100, 120).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()
        got, _ = ext.apply(params, state, jnp.asarray(to_nhwc(x)),
                           training=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-4)
