"""Feature Pyramid Network over the ResNet trunk (torchvision semantics).

Capability parity: torchvision's ``FeaturePyramidNetwork`` +
``LastLevelMaxPool`` as composed by the reference's FPN backbone builders
(src/models/org/rcnn.py:399-414 and src/models/ext/__init__.py:4-19, 256
output channels, levels from layer1..layer4, i.e. P2..P5 plus a stride-64
max-pool level).

Top-down pathway: 1x1 lateral convs, nearest-neighbor upsample, 3x3 output
convs.  Nearest upsample by exactly 2x is a zero-FLOP reshape-broadcast on
TPU; level sizes come from ceil-division so a 2x broadcast needs a crop to
the target size, done with a static slice.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L

Params = Dict[str, Any]


def _fpn_conv_init(rng, k, cin, cout) -> Params:
    # torchvision FPN init: kaiming_uniform(a=1) on weight, zero bias
    wkey, _ = jax.random.split(rng)
    fan_in = k * k * cin
    gain = math.sqrt(2.0 / (1 + 1.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(wkey, (k, k, cin, cout), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


class FPN:
    def __init__(self, in_channels_list: List[int], out_channels: int = 256,
                 extra_maxpool: bool = True):
        self.in_channels_list = in_channels_list
        self.out_channels = out_channels
        self.extra_maxpool = extra_maxpool

    def init(self, rng) -> Params:
        n = len(self.in_channels_list)
        keys = jax.random.split(rng, 2 * n)
        params: Params = {"inner_blocks": {}, "layer_blocks": {}}
        for i, cin in enumerate(self.in_channels_list):
            params["inner_blocks"][str(i)] = _fpn_conv_init(
                keys[2 * i], 1, cin, self.out_channels)
            params["layer_blocks"][str(i)] = _fpn_conv_init(
                keys[2 * i + 1], 3, self.out_channels, self.out_channels)
        return params

    @staticmethod
    def _upsample_nearest_to(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
        """Nearest 2x upsample then crop to (th, tw) — matches
        F.interpolate(..., mode='nearest', size=(th, tw)) when the source is
        the ceil-division half of the target, which stride-aligned buckets
        guarantee."""
        b, h, w, c = x.shape
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        y = y.reshape(b, 2 * h, 2 * w, c)
        return y[:, :th, :tw, :]

    def apply(self, params: Params, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """feats: [layer1..layer4] NHWC -> [P2, P3, P4, P5, (pool)]."""
        n = len(feats)
        inners = [
            L.conv2d(params["inner_blocks"][str(i)], feats[i])
            for i in range(n)
        ]
        outs: List[jnp.ndarray] = [None] * n
        last = inners[-1]
        outs[-1] = L.conv2d(params["layer_blocks"][str(n - 1)], last, padding=1)
        for i in range(n - 2, -1, -1):
            th, tw = inners[i].shape[1], inners[i].shape[2]
            last = inners[i] + self._upsample_nearest_to(last, th, tw)
            outs[i] = L.conv2d(params["layer_blocks"][str(i)], last, padding=1)
        if self.extra_maxpool:
            outs.append(L.max_pool(outs[-1], 1, 2, 0))
        return outs
