"""ResNet trunk golden-tensor parity vs an in-test torch oracle.

Builds torchvision-style Bottleneck blocks in plain torch (eval-mode BN with
eps=0 == the reference's FrozenBatchNorm2d fold), converts the state_dict,
and requires our trunk stage to reproduce torch outputs — the path zoo
teacher weights travel.
"""
import numpy as np
import torch
from torch import nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
from hnd_ghnd_tpu.models.resnet import ResNetBody


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


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


def randomize_bns(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.2))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.weight.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))


class TestResNetStageParity:
    def test_layer2_stage_matches_torch(self, rng):
        # layer2 of resnet50: 4 blocks, 256 -> 512 channels, stride 2
        blocks = nn.Sequential(
            TorchBottleneckBlock(256, 128, stride=2, downsample=True),
            TorchBottleneckBlock(512, 128),
            TorchBottleneckBlock(512, 128),
            TorchBottleneckBlock(512, 128),
        )
        randomize_bns(blocks, rng)
        blocks.eval()

        sd = {f"backbone.body.layer2.{k}": v
              for k, v in blocks.state_dict().items()}
        p_up, _ = convert_state_dict(sd)

        body = ResNetBody("resnet50")
        params, state = body.init(jax.random.PRNGKey(0))
        params = merge_pytree({"backbone": {"body": params}},
                              p_up)["backbone"]["body"]

        x = rng.randn(1, 256, 16, 20).astype(np.float32) * 0.5
        with torch.no_grad():
            want = blocks(torch.from_numpy(x)).numpy()
        got = body._apply_stage(params, jnp.asarray(to_nhwc(x)), 1)
        assert got.shape == (1, 8, 10, 512)
        np.testing.assert_allclose(to_nchw(got), want, rtol=1e-3, atol=1e-3)

    def test_stem_matches_torch(self, rng):
        conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        bn1 = nn.BatchNorm2d(64, eps=0.0)
        randomize_bns(bn1, rng)
        conv1.eval()
        bn1.eval()
        sd = {"backbone.body.conv1.weight": conv1.weight.detach(),
              **{f"backbone.body.bn1.{k}": v
                 for k, v in bn1.state_dict().items()}}
        p_up, _ = convert_state_dict(sd)
        body = ResNetBody("resnet50")
        params, _ = body.init(jax.random.PRNGKey(1))
        params = merge_pytree({"backbone": {"body": params}},
                              p_up)["backbone"]["body"]
        x = rng.randn(1, 3, 64, 80).astype(np.float32)
        with torch.no_grad():
            want = F.max_pool2d(F.relu(bn1(conv1(torch.from_numpy(x)))),
                                3, 2, 1).numpy()
        got = body.stem(params, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(got), want, rtol=1e-3, atol=1e-4)
