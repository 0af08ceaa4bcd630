"""The compressive bottleneck that replaces ResNet ``layer1``.

Architecture parity (reference: src/models/mimic/resnet_layer.py:40-70,
``Bottleneck4LargeResNet``): a 4-conv encoder 64 -> 64 -> 256 -> 64 -> b
(all kernel 2, padding 1, no bias, BN after each but the last pre-codec conv
per the reference layout) and a 5-conv decoder b -> 64 -> 128 -> 256 -> 256
(kernel 2, no padding, BNs + ReLUs as in the reference stack).  The encoder
output is the tensor that crosses the edge->server wire; at eval an affine
8-bit quantize/dequantize round-trip can be applied between encoder and
decoder (reference: src/models/mimic/base.py:50-58), and an optional "ext"
neural filter on the 64-ch pre-encoder feature can abort inference
(base.py:6-25).

Note the reference's ``Bottleneck4SmallResNet`` is dead code — its factory
always instantiates the Large variant (resnet_layer.py:80-81) — so only the
Large stack exists here.

All BatchNorms inside the bottleneck are *trainable* BN with running stats
(unlike the frozen BN of the surrounding trunk), exactly like the reference.

Kernel-size-2 / padding-1 convs grow the spatial dims by +1 each; the
decoder's four kernel-2/no-pad convs shrink them back: spatial size is
preserved end-to-end, and on stride-aligned buckets everything stays static.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.codec.quantizer import roundtrip
from hnd_ghnd_tpu.models import layers as L
from hnd_ghnd_tpu.models.ext import Ext4ResNet

Params = Dict[str, Any]

# (cin, cout, padding) per encoder conv; all kernel 2, stride 1, bias-free.
_ENC_CONVS = [(64, 64, 1), (64, 256, 1), (256, 64, 1)]
# decoder convs after the leading BN+ReLU on the bottleneck channels
_DEC_CONVS = [(None, 64), (64, 128), (128, 256), (256, 256)]
# ReLU placement mirrors the reference Sequential stacks
_ENC_RELU_AFTER = {1}          # after conv1's BN (i.e. post 256-ch BN)
_DEC_RELU_AFTER = {1, 3}       # after 128-ch BN and final 256-ch BN


class Bottleneck4LargeResNet:
    """Functional encoder/decoder bottleneck with optional ext filter."""

    def __init__(self, bottleneck_channel: int, ext_config: Optional[dict] = None,
                 quant_bits: Optional[int] = 8, host_transformer=None):
        self.bch = bottleneck_channel
        self.ext_config = ext_config
        self.ext = Ext4ResNet(64) if ext_config is not None else None
        self.quant_bits = quant_bits if quant_bits is not None else 8
        # host-side wire chain (JPEG components): applied between encoder and
        # decoder via jax.pure_callback (reference applies the same chain via
        # a forward pre-hook, src/models/mimic/base.py:50-58)
        self.host_transformer = host_transformer

    def _host_roundtrip(self, z):
        """numpy callback: run the host codec chain per image, preserving
        shape/dtype (the JPEG roundtrip reconstructs the same raster)."""
        import numpy as np
        z = np.asarray(z)
        out = []
        for i in range(z.shape[0]):
            r, _ = self.host_transformer(z[i])
            out.append(np.asarray(r, dtype=z.dtype).reshape(z[i].shape))
        return np.stack(out)

    # -- init ---------------------------------------------------------------
    def init(self, rng) -> Tuple[Params, Params]:
        keys = jax.random.split(rng, 16)
        k = iter(range(16))
        enc_p, enc_s = {}, {}
        for i, (cin, cout, _) in enumerate(_ENC_CONVS):
            enc_p[f"conv{i}"] = L.conv_init(keys[next(k)], 2, 2, cin, cout,
                                            mode="uniform")
            bn_p, bn_s = L.batch_norm_init(cout)
            enc_p[f"bn{i}"] = bn_p
            enc_s[f"bn{i}"] = bn_s
        enc_p["conv3"] = L.conv_init(keys[next(k)], 2, 2, 64, self.bch,
                                     mode="uniform")

        dec_p, dec_s = {}, {}
        bn_p, bn_s = L.batch_norm_init(self.bch)
        dec_p["bn_in"] = bn_p
        dec_s["bn_in"] = bn_s
        prev = self.bch
        for i, (_, cout) in enumerate(_DEC_CONVS):
            dec_p[f"conv{i}"] = L.conv_init(keys[next(k)], 2, 2, prev, cout,
                                            mode="uniform")
            bn_p, bn_s = L.batch_norm_init(cout)
            dec_p[f"bn{i}"] = bn_p
            dec_s[f"bn{i}"] = bn_s
            prev = cout

        params: Params = {"encoder": enc_p, "decoder": dec_p}
        state: Params = {"encoder": enc_s, "decoder": dec_s}
        if self.ext is not None:
            params["ext_classifier"] = self.ext.init(keys[next(k)])[0]
            state["ext_classifier"] = self.ext.init(keys[next(k)])[1]
        return params, state

    # -- encoder ------------------------------------------------------------
    def encode(self, params: Params, state: Params, x: jnp.ndarray, *,
               training: bool) -> Tuple[jnp.ndarray, Params]:
        p, s = params["encoder"], state["encoder"]
        new_s = {}
        z = x
        for i, (cin, cout, pad) in enumerate(_ENC_CONVS):
            z = L.conv2d(p[f"conv{i}"], z, stride=1, padding=pad)
            z, new_s[f"bn{i}"] = L.batch_norm(p[f"bn{i}"], s[f"bn{i}"], z,
                                              training=training)
            if i in _ENC_RELU_AFTER:
                z = L.relu(z)
        z = L.conv2d(p["conv3"], z, stride=1, padding=1)
        return z, new_s

    # -- decoder ------------------------------------------------------------
    def decode(self, params: Params, state: Params, z: jnp.ndarray, *,
               training: bool) -> Tuple[jnp.ndarray, Params]:
        p, s = params["decoder"], state["decoder"]
        new_s = {}
        y, new_s["bn_in"] = L.batch_norm(p["bn_in"], s["bn_in"], z,
                                         training=training)
        y = L.relu(y)
        for i in range(len(_DEC_CONVS)):
            y = L.conv2d(p[f"conv{i}"], y, stride=1, padding=0)
            y, new_s[f"bn{i}"] = L.batch_norm(p[f"bn{i}"], s[f"bn{i}"], y,
                                              training=training)
            if i in _DEC_RELU_AFTER:
                y = L.relu(y)
        return y, new_s

    # -- full forward -------------------------------------------------------
    def apply(self, params: Params, state: Params, x: jnp.ndarray, *,
              training: bool, use_bottleneck_transformer: bool = False,
              ext_training: bool = False):
        """Returns (layer1_output, new_state, ext_logits_or_None).

        The ext early-exit is a *batch-level semantic* in the reference
        (batch 1, return None).  Under jit we return ext logits alongside the
        features; the meta-architecture masks predictions where the filter
        fires, preserving the reference's observable behavior with static
        shapes.
        """
        new_state = dict(state)
        ext_logits = None
        if self.ext is not None:
            ext_logits, ext_s = self.ext.apply(
                params["ext_classifier"], state["ext_classifier"], x,
                training=training and ext_training)
            new_state["ext_classifier"] = ext_s
            if ext_training:
                return None, new_state, ext_logits

        z, enc_s = self.encode(params, state, x, training=training)
        new_state["encoder"] = enc_s
        if (not training) and use_bottleneck_transformer:
            if self.host_transformer is not None:
                z = jax.pure_callback(
                    self._host_roundtrip,
                    jax.ShapeDtypeStruct(z.shape, z.dtype), z)
            else:
                z = roundtrip(z, self.quant_bits)
        y, dec_s = self.decode(params, state, z, training=training)
        new_state["decoder"] = dec_s
        return y, new_state, ext_logits
