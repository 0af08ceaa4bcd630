"""Bottleneck wire codecs: affine quantization (bit-exact), composition.

Parity surface: the reference's ``structure/transformer.py`` Quantizer /
Dequantizer / Compose / get_bottleneck_transformer (:131-174) plus the
myutils ``tensor_util.quantize_tensor`` arithmetic they call: gemmlowp-style
affine uint quantization with scale = (max-min)/(2^bits - 1) and an integer
zero point clamped into the quant range.  num_bits == 16 means a plain
fp16 cast (Quantizer) / fp32 restore (Dequantizer).

Everything is jit-safe: fixed shapes, no host sync.  ``quantize_tensor``
is the on-device codec used both inside the bottleneck at eval
(use_bottleneck_transformer) and as the edge->server wire format of the
split deployment.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    tensor: jnp.ndarray  # uint8 (or uint dtype holding <= num_bits values)
    scale: jnp.ndarray   # scalar f32
    zero_point: jnp.ndarray  # scalar f32 (integral value)


def quantize_tensor(x: jnp.ndarray, num_bits: int = 8) -> QuantizedTensor:
    """Affine quantization, bit-exact with the reference formula.

    scale = (max - min) / (2^bits - 1); zero_point = clip(round-free integer
    cast of (-min/scale)) — note the reference truncates via ``int(...)``,
    i.e. toward zero, which for the always-nonnegative value is a floor.
    """
    qmin = 0.0
    qmax = 2.0 ** num_bits - 1.0
    min_val = x.min().astype(jnp.float32)
    max_val = x.max().astype(jnp.float32)
    scale = (max_val - min_val) / (qmax - qmin)
    initial_zp = qmin - min_val / scale
    zero_point = jnp.clip(initial_zp, qmin, qmax).astype(jnp.int32).astype(jnp.float32)
    qx = jnp.clip(zero_point + x.astype(jnp.float32) / scale, qmin, qmax)
    qx = jnp.round(qx).astype(jnp.uint8)
    return QuantizedTensor(qx, scale, zero_point)


def dequantize_tensor(q: QuantizedTensor) -> jnp.ndarray:
    return q.scale * (q.tensor.astype(jnp.float32) - q.zero_point)


class Quantizer:
    """num_bits==16 -> fp16 cast; otherwise affine quantization."""

    def __init__(self, num_bits: int = 8):
        self.num_bits = num_bits

    def __call__(self, z, target=None):
        if self.num_bits == 16:
            return z.astype(jnp.float16), target
        return quantize_tensor(z, self.num_bits), target


class Dequantizer:
    def __init__(self, num_bits: int = 8):
        self.num_bits = num_bits

    def __call__(self, qz, target=None):
        if self.num_bits == 16:
            return qz.astype(jnp.float32), target
        return dequantize_tensor(qz), target


class Compose:
    def __init__(self, components):
        self.components = list(components)

    def __call__(self, z, target=None):
        for c in self.components:
            z, target = c(z, target)
        return z, target


TRANSFORMER_CLASS_DICT = {
    "quantizer": Quantizer,
    "dequantizer": Dequantizer,
}


def get_bottleneck_transformer(transformer_config: Optional[Dict[str, Any]]):
    """Build the quantize/dequantize chain from the reference YAML schema
    (``bottleneck_transformer: {order: [...], components: {...}}``).

    JPEG components are host-side and handled by the codec.jpeg module; they
    are rejected here because they cannot run inside a jitted model.
    """
    if transformer_config is None:
        return None
    components = []
    comp_cfg = transformer_config["components"]
    for name in transformer_config["order"]:
        if name not in TRANSFORMER_CLASS_DICT:
            raise KeyError(
                f"transformer `{name}` is not supported inside the jitted model"
            )
        components.append(TRANSFORMER_CLASS_DICT[name](**comp_cfg[name]["params"]))
    return Compose(components) if components else None


def roundtrip(z: jnp.ndarray, num_bits: int = 8) -> jnp.ndarray:
    """Quantize -> dequantize in one jittable call (the common eval path).

    On TPU this dispatches to the fused Pallas kernels
    (ops/pallas_quant.py, bit-exact with the jnp formulation)."""
    if num_bits == 16:
        return z.astype(jnp.float16).astype(jnp.float32)
    import jax
    if num_bits <= 8 and jax.default_backend() == "tpu":
        from hnd_ghnd_tpu.ops.pallas_quant import (pallas_dequantize,
                                                   pallas_quantize)
        return pallas_dequantize(pallas_quantize(z, num_bits)).astype(z.dtype)
    return dequantize_tensor(quantize_tensor(z, num_bits)).astype(z.dtype)
