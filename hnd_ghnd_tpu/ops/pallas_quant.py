"""Pallas TPU kernels for the affine bottleneck quantizer.

The quantize/dequantize round-trip runs on every eval forward and on every
edge->server wire transmission (codec/quantizer.py), always on fixed-shape
bottleneck tensors.  These kernels fuse the affine transform, rounding and
clamping into single VMEM passes, gridded in chunks so arbitrarily large
tensors never exceed VMEM (a [B, 836, 1348, 3] bottleneck is ~27MB — bigger
than the 16MB VMEM budget, so blocks are mandatory, not an optimization).

Structure: global min/max via a plain XLA reduction (already optimal),
then (1) a gridded elementwise quantize kernel reading the scalar
(min, max) from SMEM and (2) a gridded dequantize kernel.
Bit-exact with the reference formula (same divide/round/clamp arithmetic,
f32) up to one hardware caveat: TPU f32 division is reciprocal-based and can
differ from IEEE by 1 ulp, which flips values landing exactly on a .5
rounding boundary to the adjacent quantization level (~1e-7 of elements on
real data, |error| = 1 level = half the reference's own rounding error).
Interpreter mode (CPU tests) is exactly bit-identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnd_ghnd_tpu.codec.quantizer import QuantizedTensor

# 512K f32 = 2MB per block: safely inside VMEM with double buffering
_CHUNK = 512 * 1024
_LANES = 1024  # chunk rows are [_CHUNK // _LANES, _LANES]


def _pad_chunks(flat: jnp.ndarray) -> jnp.ndarray:
    n = flat.shape[0]
    padded = pl.cdiv(n, _CHUNK) * _CHUNK
    if padded != n:
        # edge-pad so the padding never perturbs min/max
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(flat[-1:], (padded - n,))])
    return flat.reshape(-1, _CHUNK // _LANES, _LANES)


def _quant_kernel(minmax_ref, x_ref, q_ref, *, num_bits: int):
    qmax = 2.0 ** num_bits - 1.0
    min_val = minmax_ref[0, 0]
    max_val = minmax_ref[0, 1]
    raw_scale = (max_val - min_val) / qmax
    # constant-tensor guard (scale=0 -> scale=1): matches codec.quantizer
    scale = jnp.where(raw_scale > 0, raw_scale, 1.0)
    # exact division (not reciprocal-multiply) for bit-parity with the
    # reference at .5 rounding boundaries; truncated integer zero point
    zp = jnp.clip(-min_val / scale, 0.0, qmax).astype(jnp.int32).astype(jnp.float32)
    q = jnp.clip(zp + x_ref[:] / scale, 0.0, qmax)
    # Mosaic lacks a direct f32->uint8 cast; emit rounded f32, cast outside
    q_ref[:] = jnp.round(q)


def _dequant_kernel(meta_ref, q_ref, out_ref):
    scale = meta_ref[0, 0]
    zp = meta_ref[0, 1]
    # widen uint8 through int32 (no direct uint8->f32 cast in Mosaic)
    q = q_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = scale * (q - zp)


@functools.partial(jax.jit, static_argnames=("num_bits", "interpret"))
def pallas_quantize(x: jnp.ndarray, num_bits: int = 8,
                    interpret: bool = False) -> QuantizedTensor:
    """Affine uint8 quantization, bit-exact with
    codec.quantizer.quantize_tensor; gridded for any tensor size."""
    assert num_bits <= 8
    orig_shape = x.shape
    n = x.size
    chunks = _pad_chunks(x.reshape(-1).astype(jnp.float32))
    n_chunks = chunks.shape[0]

    # global min/max as a plain XLA reduction (optimal; a per-chunk Pallas
    # reduction output would violate the (8, 128) SMEM tiling constraint)
    minmax = jnp.stack([chunks.min(), chunks.max()]).reshape(1, 2)
    q = pl.pallas_call(
        functools.partial(_quant_kernel, num_bits=num_bits),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, _CHUNK // _LANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _CHUNK // _LANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(chunks.shape, jnp.float32),
        interpret=interpret,
    )(minmax, chunks)

    qmax = 2.0 ** num_bits - 1.0
    raw_scale = (minmax[0, 1] - minmax[0, 0]) / qmax
    scale = jnp.where(raw_scale > 0, raw_scale, 1.0)
    zp = jnp.clip(-minmax[0, 0] / scale, 0.0, qmax).astype(jnp.int32).astype(jnp.float32)
    q8 = q.reshape(-1)[:n].astype(jnp.uint8).reshape(orig_shape)
    return QuantizedTensor(q8, scale, zp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_dequantize(q: QuantizedTensor, interpret: bool = False) -> jnp.ndarray:
    orig_shape = q.tensor.shape
    n = q.tensor.size
    chunks = _pad_chunks(q.tensor.reshape(-1))
    n_chunks = chunks.shape[0]
    meta = jnp.stack([q.scale, q.zero_point]).reshape(1, 2).astype(jnp.float32)
    out = pl.pallas_call(
        _dequant_kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, _CHUNK // _LANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _CHUNK // _LANES, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(chunks.shape, jnp.float32),
        interpret=interpret,
    )(meta, chunks)
    return out.reshape(-1)[:n].reshape(orig_shape)
