"""FPN composite parity vs an in-test torch oracle (torchvision semantics:
1x1 laterals, nearest top-down upsample, 3x3 output convs, stride-64
max-pool extra level)."""
import numpy as np
import torch
from torch import nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models.convert import convert_state_dict, merge_pytree
from hnd_ghnd_tpu.models.fpn import FPN


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


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


class TestFPNParity:
    def test_fpn_matches_torch(self, rng):
        chans = [256, 512, 1024, 2048]
        tm = TorchFPN(chans).eval()
        sd = {f"backbone.fpn.{k}": v for k, v in tm.state_dict().items()}
        p_up, _ = convert_state_dict(sd)

        fpn = FPN(chans, 256)
        params = merge_pytree(
            {"backbone": {"fpn": fpn.init(jax.random.PRNGKey(0))}},
            p_up)["backbone"]["fpn"]

        feats_nchw = [rng.randn(1, c, 24 // (2 ** i), 32 // (2 ** i))
                      .astype(np.float32) * 0.2
                      for i, c in enumerate(chans)]
        with torch.no_grad():
            want = [t.numpy() for t in
                    tm([torch.from_numpy(f) for f in feats_nchw])]
        got = fpn.apply(params, [jnp.asarray(to_nhwc(f)) for f in feats_nchw])
        assert len(got) == 5
        for g, w in zip(got, want):
            np.testing.assert_allclose(to_nchw(g), w, rtol=1e-3, atol=1e-4)

    def test_fpn_odd_sizes_upsample(self, rng):
        # ceil-division level sizes (e.g. 13 -> 7) exercise the crop path
        chans = [32, 64]
        tm = TorchFPN(chans).eval()
        sd = {f"backbone.fpn.{k}": v for k, v in tm.state_dict().items()}
        p_up, _ = convert_state_dict(sd)
        fpn = FPN(chans, 256)
        params = merge_pytree(
            {"backbone": {"fpn": fpn.init(jax.random.PRNGKey(1))}},
            p_up)["backbone"]["fpn"]
        feats = [rng.randn(1, 32, 13, 21).astype(np.float32),
                 rng.randn(1, 64, 7, 11).astype(np.float32)]
        with torch.no_grad():
            want = [t.numpy() for t in tm([torch.from_numpy(f) for f in feats])]
        got = fpn.apply(params, [jnp.asarray(to_nhwc(f)) for f in feats])
        for g, w in zip(got, want):
            np.testing.assert_allclose(to_nchw(g), w, rtol=1e-3, atol=1e-4)
