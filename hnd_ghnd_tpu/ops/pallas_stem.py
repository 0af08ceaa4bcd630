"""Pallas TPU kernel for the ResNet stem conv (7x7/s2, 3ch) + frozen BN + ReLU.

Why this exists: the stem is the one conv XLA cannot tile well on TPU — with
3 input channels the MXU runs at ~3% utilization and the 7x7/s2 conv on a
[24, 832, 1344, 3] batch costs ~45 ms, ~15% of the whole GHND distillation
step (reference hot loop: src/mimic_runner.py:38-59 — its CUDA path leans on
cuDNN's dedicated small-channel stem kernels; TPU needs its own).  Measured
on v5e: every pure-XLA reformulation (space-to-depth 4x4x12, pre-laid-out
s2d, im2col) also lands at 45-55 ms because the conv emitter, not the
layout, is the bottleneck.

TPU formulation
---------------
1.  XLA prologue (cheap, fusable): pad H/W by 3 (the conv pad) and channels
    3->4, then space-to-depth 2x2 so the stride-2 conv becomes stride-1:
    x[B, H, W, 3] -> s2d[B, H/2+3+, W/2+3, 16] with channel order
    (sub_y, sub_x, c4).  Output row r of the conv reads s2d rows r..r+3 and
    output col c reads s2d cols c..c+3 (tap (ky, kx) lives at s2d offset
    (dy, sy, dx, sx) with ky = 2*dy + sy, kx = 2*dx + sx; the 8th row/col
    and 4th channel carry zero weights).
2.  Pallas kernel, grid (B, OH/TR): build im2col patches [TR, OW, 256] in
    VMEM from 16 shifted slices (256 = 4x4 spatial taps x 16 s2d channels —
    exactly two 128-lane MXU K-tiles), then one fp32-accumulated matmul
    against the reshaped weights [256, 64], fused with the folded BN affine
    and ReLU.  Overlapping row windows (TR+3 rows per TR-row output block)
    are expressed as TWO pipelined BlockSpecs over the same array, offset by
    one block — keeping Mosaic's automatic double-buffering instead of
    manual DMA.
3.  Backward (custom VJP): dWmat via a second Pallas kernel that rebuilds
    patches per tile and accumulates [256, 64] fp32 partials across the
    sequential TPU grid; dscale/dbias as XLA reductions over the saved
    pre-affine conv output (the vjp-mode forward kernel emits it as a second
    output — the plain inference path never pays that extra write); dx as
    the standard XLA transposed conv, dead-code-eliminated whenever the stem
    input (the image) needs no gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8  # output rows per grid step


# ---------------------------------------------------------------------------
# Layout transforms (XLA prologue)
# ---------------------------------------------------------------------------

def _s2d_input(x: jnp.ndarray, n_row_blocks: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, (n_row_blocks+1)*TR, W/2+3, 16] space-to-depth.

    Pads H and W by 3 on each side (the 7x7 conv's SAME padding), channels
    to 4, and rows to one block beyond the grid so the shifted second
    BlockSpec never reads out of bounds.
    """
    b, h, w, _ = x.shape
    rows = (n_row_blocks + 1) * _TR
    row_pad = 2 * rows - (h + 6)
    xp = jnp.pad(x, ((0, 0), (3, 3 + row_pad), (3, 3), (0, 1)))
    hp, wp = xp.shape[1], xp.shape[2]
    s2 = xp.reshape(b, hp // 2, 2, wp // 2, 2, 4)
    s2 = s2.transpose(0, 1, 3, 2, 4, 5)  # (B, R, C2, sy, sx, c4)
    return s2.reshape(b, hp // 2, wp // 2, 16)


def _s2d_weights(w7: jnp.ndarray) -> jnp.ndarray:
    """[7, 7, 3, 64] HWIO -> [256, 64] with K = (dy, dx, sy, sx, c4)."""
    w8 = jnp.pad(w7, ((0, 1), (0, 1), (0, 1), (0, 0)))  # [8, 8, 4, 64]
    w = w8.reshape(4, 2, 4, 2, 4, w8.shape[-1])  # (dy, sy, dx, sx, c, o)
    w = w.transpose(2, 0, 1, 3, 4, 5)            # (dx, dy, sy, sx, c, o)
    return w.reshape(256, w8.shape[-1])


def _from_s2d_weight_grad(dwmat: jnp.ndarray) -> jnp.ndarray:
    """[256, 64] -> [7, 7, 3, 64]: each tap (ky, kx) has exactly one
    (dy, sy) / (dx, sx) decomposition, so this is a pure re-index."""
    w = dwmat.reshape(4, 4, 2, 2, 4, dwmat.shape[-1])  # (dx, dy, sy, sx, c, o)
    w = w.transpose(1, 2, 0, 3, 4, 5)  # (dy, sy, dx, sx, c, o)
    w8 = w.reshape(8, 8, 4, dwmat.shape[-1])
    return w8[:7, :7, :3, :]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _patch_rows(a_ref, b_ref, tr: int, ow: int):
    """Yield per-dx im2col slabs [tr, ow, 64] (4 dy-taps x 16 s2d channels).

    For a rank-3 [tr, ws, 16] vector Mosaic tiles (sublane, lane) over the
    last two dims, so a width shift (dx) is a SUBLANE offset and a row
    shift (dy) lives on the untiled outer dim.  tpu.concatenate rejects
    inputs whose offsets differ on a non-concat dim, so slabs are grouped
    by dx (uniform sublane offset), concatenating the four dy shifts along
    the lane (concat) dim.  The matmul then runs as 4 accumulated K=64
    dots against static row-slices of the [256, co] weight matrix, whose K
    axis is ordered (dx, dy, sy, sx, c) to match.
    """
    rows = jnp.concatenate([a_ref[0], b_ref[0, :3]], axis=0)  # [tr+3, ws, 16]
    for dx in range(4):
        parts = [jax.lax.slice(rows, (dy, dx, 0), (dy + tr, dx + ow, 16))
                 for dy in range(4)]
        yield jnp.concatenate(parts, axis=-1)  # [tr, ow, 64]


def _conv_acc(a_ref, b_ref, w_ref, tr, ow):
    # Flatten [tr, ow, 64] -> [tr*ow, 64] before each dot: a rank-3 dot
    # lowers to tr tiny matmuls (measured 10x slower — issue overhead
    # dominates at M=672); the merge of the outer dim into sublanes is a
    # free relayout when ow is a multiple of the 8-row sublane tile.
    co = w_ref.shape[-1]
    conv = None
    for dx, slab in enumerate(_patch_rows(a_ref, b_ref, tr, ow)):
        part = jax.lax.dot_general(
            slab.reshape(tr * ow, 64), w_ref[dx * 64:(dx + 1) * 64, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        conv = part if conv is None else conv + part
    return conv.reshape(tr, ow, co)  # fp32


def _stem_fwd_kernel(a_ref, b_ref, w_ref, sb_ref, out_ref, *, tr, ow):
    conv = _conv_acc(a_ref, b_ref, w_ref, tr, ow)
    acc = conv * sb_ref[0][None, None, :] + sb_ref[1][None, None, :]
    out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


def _stem_fwd_res_kernel(a_ref, b_ref, w_ref, sb_ref, out_ref, conv_ref, *,
                         tr, ow):
    """vjp-mode forward: also emits the pre-affine conv for the backward."""
    conv = _conv_acc(a_ref, b_ref, w_ref, tr, ow)
    conv_ref[0] = conv.astype(conv_ref.dtype)
    acc = conv * sb_ref[0][None, None, :] + sb_ref[1][None, None, :]
    out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


def _stem_dw_kernel(a_ref, b_ref, g_ref, dw_ref, *, tr, ow):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    g = g_ref[0].reshape(tr * ow, -1)  # [tr*ow, co]
    for dx, slab in enumerate(_patch_rows(a_ref, b_ref, tr, ow)):
        # single contracting dim (Mosaic's matmul cannot contract two), in
        # the transpose_lhs form: [tr*ow, 64]^T @ [tr*ow, co]
        dw_ref[dx * 64:(dx + 1) * 64, :] += jax.lax.dot_general(
            slab.reshape(tr * ow, 64), g.astype(slab.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _row_specs(ws: int):
    return [
        pl.BlockSpec((1, _TR, ws, 16), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _TR, ws, 16), lambda bi, i: (bi, i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _run_fwd(s2d, wmat, sb, oh_pad, ow, out_dtype, interpret, with_conv):
    b, _, ws, _ = s2d.shape
    co = wmat.shape[-1]
    kern = functools.partial(
        _stem_fwd_res_kernel if with_conv else _stem_fwd_kernel,
        tr=_TR, ow=ow)
    out_block = pl.BlockSpec((1, _TR, ow, co), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, oh_pad, ow, co), out_dtype)
    if with_conv:
        out_specs = (out_block, out_block)
        out_shapes = (out_shape, out_shape)
    else:
        out_specs, out_shapes = out_block, out_shape
    return pl.pallas_call(
        kern,
        grid=(b, oh_pad // _TR),
        in_specs=_row_specs(ws) + [
            pl.BlockSpec((256, co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(s2d, s2d, wmat, sb)


def _run_dw(s2d, g, oh_pad, ow, interpret):
    b, _, ws, _ = s2d.shape
    co = g.shape[-1]
    kern = functools.partial(_stem_dw_kernel, tr=_TR, ow=ow)
    return pl.pallas_call(
        kern,
        grid=(b, oh_pad // _TR),
        in_specs=_row_specs(ws) + [
            pl.BlockSpec((1, _TR, ow, co), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, co), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, co), jnp.float32),
        interpret=interpret,
    )(s2d, s2d, g)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def stem_supported(x: jnp.ndarray) -> bool:
    """Shapes the Pallas stem handles: NHWC with 3 channels and even,
    reasonably sized H/W (every stride-64 training/eval bucket qualifies)."""
    return (x.ndim == 4 and x.shape[-1] == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[1] // 2 >= _TR and x.shape[2] // 2 >= 16)


def _geometry(x):
    b, h, w, _ = x.shape
    oh, ow = h // 2, w // 2
    nr = -(-oh // _TR)
    return oh, ow, nr, nr * _TR


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def stem_conv_bn_relu(x, w7, scale, bias, interpret=False):
    """relu(frozen_bn(conv7x7_s2(x))) fused on the MXU.

    x: [B, H, W, 3] (H, W even); w7: [7, 7, 3, 64] HWIO;
    scale/bias: folded frozen-BN affine [64].  Returns [B, H/2, W/2, 64]
    in x.dtype.  Matches models/resnet.py ResNetBody.stem (minus maxpool),
    replicating torchvision resnet conv1+bn1+relu semantics
    (reference backbone stem, src/models/org/rcnn.py via torchvision).
    """
    oh, ow, nr, oh_pad = _geometry(x)
    s2d = _s2d_input(x, nr)
    wmat = _s2d_weights(w7).astype(x.dtype)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    out = _run_fwd(s2d, wmat, sb, oh_pad, ow, x.dtype, interpret,
                   with_conv=False)
    return out[:, :oh]


def _stem_vjp_fwd(x, w7, scale, bias, interpret):
    oh, ow, nr, oh_pad = _geometry(x)
    s2d = _s2d_input(x, nr)
    wmat = _s2d_weights(w7).astype(x.dtype)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    out, conv = _run_fwd(s2d, wmat, sb, oh_pad, ow, x.dtype, interpret,
                         with_conv=True)
    return out[:, :oh], (s2d, w7, scale, bias, conv, x.shape)


def _stem_vjp_bwd(interpret, res, g):
    s2d, w7, scale, bias, conv, x_shape = res
    b, h, w, _ = x_shape
    oh, ow = h // 2, w // 2
    oh_pad = conv.shape[1]

    convf = conv[:, :oh].astype(jnp.float32)
    pre = convf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    g_pre = g.astype(jnp.float32) * (pre > 0)
    dbias = jnp.sum(g_pre, axis=(0, 1, 2))
    dscale = jnp.sum(g_pre * convf, axis=(0, 1, 2))
    g_conv = g_pre * scale.astype(jnp.float32)

    # weight grad on the MXU (patches rebuilt per tile from the saved s2d)
    g_dw = jnp.pad(g_conv, ((0, 0), (0, oh_pad - oh), (0, 0), (0, 0)))
    g_dw = g_dw.astype(conv.dtype)
    dwmat = _run_dw(s2d, g_dw, oh_pad, ow, interpret)
    dw7 = _from_s2d_weight_grad(dwmat).astype(w7.dtype)

    # input grad: standard transposed conv in XLA.  The stem input is the
    # image, so under jit this whole branch is dead-code-eliminated in every
    # real training/eval program.
    w_rot = jnp.flip(w7, (0, 1)).swapaxes(2, 3)  # [7, 7, 64, 3]
    # transposed-conv padding: lo = k-1-p = 3, hi = 3 + (H+2p-k) mod s = 4
    dx = jax.lax.conv_general_dilated(
        g_conv.astype(jnp.float32), w_rot.astype(jnp.float32),
        window_strides=(1, 1), padding=((3, 4), (3, 4)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dx = dx[:, :h, :w].astype(jnp.float32)
    return dx, dw7, dscale, dbias


stem_conv_bn_relu.defvjp(_stem_vjp_fwd, _stem_vjp_bwd)


def stem_reference(x, w7, scale, bias):
    """XLA formulation (the pre-kernel path), used as the oracle in tests
    and as the fallback off-TPU / on unsupported shapes."""
    out = jax.lax.conv_general_dilated(
        x, w7.astype(x.dtype), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out * scale.astype(out.dtype) + bias.astype(out.dtype)
    return jnp.maximum(out, 0)
