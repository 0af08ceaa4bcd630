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

    Degenerate constant tensors (max == min: an ext-gated empty image, a
    black frame) would divide by zero; the guard substitutes scale=1 so the
    wire carries finite values (reconstruction error <= 0.5, the codec's own
    step size).  The reference crashes with NaNs here.
    """
    qmin = 0.0
    qmax = 2.0 ** num_bits - 1.0
    min_val = x.min().astype(jnp.float32)
    max_val = x.max().astype(jnp.float32)
    scale = (max_val - min_val) / (qmax - qmin)
    safe_scale = jnp.where(scale > 0, scale, 1.0)
    initial_zp = qmin - min_val / safe_scale
    zero_point = jnp.clip(initial_zp, qmin, qmax).astype(jnp.int32).astype(jnp.float32)
    qx = jnp.clip(zero_point + x.astype(jnp.float32) / safe_scale, qmin, qmax)
    qx = jnp.round(qx).astype(jnp.uint8)
    return QuantizedTensor(qx, safe_scale, zero_point)


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
    def __init__(self, components, host_side: bool = False):
        self.components = list(components)
        # host_side chains contain components that cannot run inside jit
        # (JPEG via libjpeg); the model hands the bottleneck tensor to them
        # through jax.pure_callback at the encoder/decoder boundary
        self.host_side = host_side

    def __call__(self, z, target=None):
        for c in self.components:
            z, target = c(z, target)
        return z, target


TRANSFORMER_CLASS_DICT = {
    "quantizer": Quantizer,
    "dequantizer": Dequantizer,
}

HOST_TRANSFORMER_NAMES = ("jpeg_compressor", "jpeg_decompressor")


def get_bottleneck_transformer(transformer_config: Optional[Dict[str, Any]]):
    """Build the wire-codec chain from the reference YAML schema
    (``bottleneck_transformer: {order: [...], components: {...}}``;
    reference TRANSFORMER_CLASS_DICT accepts quantizer / dequantizer /
    jpeg_compressor / jpeg_decompressor,
    src/structure/transformer.py:156-174).

    Pure quantize/dequantize chains build the jit-native jnp classes.  A
    chain naming any JPEG component becomes a host-side numpy chain
    (codec.jpeg classes, bit-exact quantizer arithmetic) marked
    ``host_side=True``; the model routes the bottleneck tensor through it
    with jax.pure_callback — the jit-boundary hand-off for libjpeg.
    """
    if transformer_config is None:
        return None
    order = list(transformer_config["order"])
    comp_cfg = transformer_config["components"]
    host_side = any(name in HOST_TRANSFORMER_NAMES for name in order)
    if host_side:
        from hnd_ghnd_tpu.codec import jpeg as jpeg_codec
        class_dict = {
            "quantizer": jpeg_codec.HostQuantizer,
            "dequantizer": jpeg_codec.HostDequantizer,
            "jpeg_compressor": jpeg_codec.JpegCompressor,
            "jpeg_decompressor": jpeg_codec.JpegDecompressor,
        }
    else:
        class_dict = TRANSFORMER_CLASS_DICT
    components = []
    for name in order:
        if name not in class_dict:
            raise KeyError(f"transformer `{name}` is not expected")
        params = (comp_cfg.get(name, {}) or {}).get("params", {}) or {}
        # the reference's JPEG classes take a tmp_dir_path (they write temp
        # files); ours keep the payload in memory — accept and ignore it
        params = {k: v for k, v in params.items() if k != "tmp_dir_path"}
        components.append(class_dict[name](**params))
    return Compose(components, host_side=host_side) if components else None


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
