"""The "ext" neural filter: a tiny CNN that decides whether an image contains
any object of interest, gating the split-computing pipeline.

Architecture parity (reference: src/models/ext/classifier.py:16-37,
``Ext4ResNet``): AdaptiveAvgPool(64x64) -> conv(in->64, k4 s2) -> BN -> ReLU
-> conv(64->32, k3 s2) -> BN -> ReLU -> conv(32->16, k2 s1) -> BN -> ReLU ->
AdaptiveAvgPool(8x8) -> Linear(1024 -> 2); softmax applied at eval.

Adaptive pools are MXU matmuls (see layers.adaptive_avg_pool), so the filter
costs microseconds on-device — it must be cheap, it runs on the edge head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L

Params = Dict[str, Any]

_CONVS = [  # (cin, cout, kernel, stride)
    (None, 64, 4, 2),
    (64, 32, 3, 2),
    (32, 16, 2, 1),
]


class Ext4ResNet:
    def __init__(self, input_channel: int):
        self.cin = input_channel

    def init(self, rng) -> Tuple[Params, Params]:
        keys = jax.random.split(rng, 4)
        params: Params = {}
        state: Params = {}
        prev = self.cin
        for i, (_, cout, k, _s) in enumerate(_CONVS):
            params[f"conv{i}"] = L.conv_init(keys[i], k, k, prev, cout,
                                             use_bias=True, mode="uniform")
            bn_p, bn_s = L.batch_norm_init(cout)
            params[f"bn{i}"] = bn_p
            state[f"bn{i}"] = bn_s
            prev = cout
        params["linear"] = L.linear_init(keys[3], 16 * 8 * 8, 2)
        return params, state

    def apply(self, params: Params, state: Params, x: jnp.ndarray, *,
              training: bool) -> Tuple[jnp.ndarray, Params]:
        """x: [B, H, W, cin] -> logits (train) / softmax probs (eval) [B, 2]."""
        new_state = {}
        z = L.adaptive_avg_pool(x, (64, 64))
        for i, (_, _cout, _k, s) in enumerate(_CONVS):
            z = L.conv2d(params[f"conv{i}"], z, stride=s, padding=0)
            z, new_state[f"bn{i}"] = L.batch_norm(
                params[f"bn{i}"], state[f"bn{i}"], z, training=training)
            z = L.relu(z)
        z = L.adaptive_avg_pool(z, (8, 8))
        # flatten channel-major (torch NCHW flatten order) so converted
        # torch Linear weights apply unchanged
        z = jnp.transpose(z, (0, 3, 1, 2)).reshape(z.shape[0], -1)
        logits = L.linear(params["linear"], z)
        if not training:
            logits = jax.nn.softmax(logits, axis=1)
        return logits, new_state
