"""Pallas TPU kernel for the affine bottleneck quantizer.

The quantize/dequantize round-trip runs on every eval forward and on every
edge->server wire transmission (codec/quantizer.py), always on the same
fixed-shape bottleneck tensor.  The jnp reference implementation materializes
the scaled tensor in HBM between ops; this kernel fuses scale computation,
affine transform, rounding, clamping, and the uint8 cast into one VMEM pass.

The min/max reduction runs as a first grid pass into SMEM scratch, the
quantization as a second pass — a standard two-phase Pallas reduction
(guide: "Patterns: Quantization Kernels").  Falls back to the jnp path off
TPU (CPU tests run the interpreter).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnd_ghnd_tpu.codec.quantizer import QuantizedTensor


def _quant_kernel(x_ref, minmax_ref, q_ref, scale_ref, zp_ref, *,
                  num_bits: int):
    qmax = 2.0 ** num_bits - 1.0
    min_val = minmax_ref[0, 0]
    max_val = minmax_ref[0, 1]
    scale = (max_val - min_val) / qmax
    # exact division (not reciprocal-multiply): bit-parity with the
    # reference formula at .5 rounding boundaries
    zp = jnp.clip(-min_val / scale, 0.0, qmax).astype(jnp.int32).astype(jnp.float32)
    q = jnp.clip(zp + x_ref[:] / scale, 0.0, qmax)
    # Mosaic lacks a direct f32->uint8 cast; emit rounded f32, cast outside
    # (XLA fuses the cast into the output copy)
    q_ref[:] = jnp.round(q)
    scale_ref[0, 0] = scale
    zp_ref[0, 0] = zp


def _minmax_kernel(x_ref, out_ref):
    out_ref[0, 0] = jnp.min(x_ref[:])
    out_ref[0, 1] = jnp.max(x_ref[:])


@functools.partial(jax.jit, static_argnames=("num_bits", "interpret"))
def pallas_quantize(x: jnp.ndarray, num_bits: int = 8,
                    interpret: bool = False) -> QuantizedTensor:
    """Affine uint8 quantization as a fused Pallas kernel.

    Bit-exact with codec.quantizer.quantize_tensor (same clamp/round/trunc
    arithmetic), restricted to num_bits <= 8 (uint8 storage).
    """
    assert num_bits <= 8
    orig_shape = x.shape
    flat = x.reshape(1, -1).astype(jnp.float32)

    minmax = pl.pallas_call(
        _minmax_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(flat)

    q, scale, zp = pl.pallas_call(
        functools.partial(_quant_kernel, num_bits=num_bits),
        out_shape=(
            jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(flat, minmax)

    return QuantizedTensor(q.astype(jnp.uint8).reshape(orig_shape),
                           scale[0, 0], zp[0, 0])


def _dequant_kernel(q_ref, meta_ref, out_ref):
    scale = meta_ref[0, 0]
    zp = meta_ref[0, 1]
    # Mosaic has no direct uint8->f32 cast; widen through int32
    q = q_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = scale * (q - zp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_dequantize(q: QuantizedTensor, interpret: bool = False) -> jnp.ndarray:
    flat = q.tensor.reshape(1, -1)
    meta = jnp.stack([q.scale, q.zero_point]).reshape(1, 2).astype(jnp.float32)
    out = pl.pallas_call(
        _dequant_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, meta)
    return out.reshape(q.tensor.shape)
