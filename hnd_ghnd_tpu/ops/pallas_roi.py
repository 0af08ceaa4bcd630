"""Pallas TPU RoIAlign: per-RoI window DMA + MXU bilinear reduction.

Replaces the XLA row-gather formulation of ``ops/roi_align.py`` on the eval
path (reference op: torchvision's CUDA ``roi_align``,
/root/reference/src/models/org/rcnn.py:196-199, :261-265).  Round-3
attribution (BASELINE.md) measured the XLA program at a ~64 ms row-gather
floor (one 512-byte [C] row per gather element, ~50 GB/s effective) plus a
~38 ms bilinear-weight multiply that XLA cannot fuse into the gather
(per-row broadcast weights defeat gather-consumer fusion).  This kernel
attacks both at once:

* instead of 4*s^2 row gathers per RoI it issues ONE strided window DMA
  (or 14 strip DMAs, see classes below) per RoI — large contiguous
  transfers that ride the DMA engines near HBM bandwidth instead of the
  per-row scatter floor, and
* the bilinear weighting happens in VMEM: the y-interpolation is an MXU
  matmul over the window rows, the x-interpolation a static unrolled
  scalar-weighted lane-slice accumulation — zero extra HBM traffic.

Exactness over arbitrary boxes
------------------------------
A fixed window only covers RoIs whose feature-space extent fits it, and FPN
level assignment (ops/roi_align.py::assign_levels) bounds the extent
PRODUCT (w_f * h_f < 28^2 for unclamped levels; clamped-up RoIs at P5 are
bounded by the P5 map, <= 46 per axis for buckets <= 1472 px), not each
axis — a 1x800 px box lands on P2 with a 200-row extent.  Three DMA
classes make the kernel exact for every box:

* class A (y-span < 48 and x-span < 48): one [56, 48*C] window DMA.
  Covers every aspect <= ~3 RoI and ALL clamped-P5 RoIs.
* class T (tall, x-span < 24): per sample, one [16, 24*C] strip DMA
  covering the corner row pair (rows y_lo, y_lo+1 are consecutive),
  pipelined through a 2-slot buffer with the per-sample y-contraction
  accumulated.  The product bound guarantees x-span < 24 whenever
  y-span >= 48.
* class W (wide, remainder): P*s [32, 2*C] column-pair strips (bilinear
  x corners are consecutive columns).  The product bound guarantees
  y-span < 24 whenever x-span >= 48.

Fetch rows are 8 larger than the covered span because Mosaic requires DMA
slices of a tiled (8,128) HBM memref to start on a sublane-tile boundary:
starts are snapped down to a multiple of 8 (stored pre-divided in idx so
the in-kernel ``r8 * 8`` is provably aligned) and the <= 7-row slack rides
in the fetch-relative weight positions.

Class selection, window starts, and the two per-RoI weight matrices are
vectorized XLA prep (one ``one_hot`` scatter per axis); snap/clamp edge
cases (torchvision's ``low >= size-1`` snap, window clamping at borders)
fold into fetch-relative weight positions, so the kernel itself is
branch-free arithmetic per class.  Every scratch window is fully
overwritten by its class's DMAs before compute touches it — no zero-init,
no garbage-NaN hazard.

Layout notes (the part Mosaic dictates): each FPN level is reshaped in XLA
to a 2-D HBM table ``[B*Hl, Wl*C]`` (padded to >= 48 rows/cols per image so
every window fits), which makes a spatial window a plain 2-D strided slice
— one ``make_async_copy`` per RoI, no per-row descriptors.  The
y-contraction then rides the MXU as ``[P, rows] @ [rows, cols*C]`` with
(x, c) flattened into lanes, and the x-contraction reads static 256-lane
slices — sidestepping the lane<->sublane reshapes and strided lane slices
this Mosaic lacks (see ops/pallas_stem.py's negative result).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnd_ghnd_tpu.ops.roi_align import (_bilinear_params, _level_geometry,
                                        assign_levels, quantize_fpn_levels)

WIN = 48        # class-A window rows/cols
TSTRIP = 24     # class-T strip cols / class-W strip rows
# Mosaic requires DMA source slices of a tiled (8,128) HBM memref to start
# on a sublane-tile boundary, so every fetch row start is snapped DOWN to a
# multiple of 8 (stored pre-divided in idx; the kernel multiplies by 8,
# which the divisibility prover accepts) and the fetch is extended to cover
# the <=7-row slack:
WIN_F = WIN + 8   # class-A fetch rows
TFETCH = 16       # class-T per-sample fetch rows (2 needed + slack, pad8)
WFETCH = TSTRIP + 8  # class-W fetch rows


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _padded_h(h: int) -> int:
    """Per-image table rows: 8-aligned (so per-image offsets stay on tile
    boundaries) and >= WIN_F (so clamped fetch starts stay in range)."""
    return max(WIN_F, _pad8(h))


# --------------------------------------------------------------------- prep
def _make_tables(features: Sequence[jnp.ndarray]):
    """Flatten each level to [B*Hlp, Wlp*C], zero-padded to >= WIN_F rows
    (8-aligned) / >= WIN cols (only P5 — and tiny-fixture levels — actually
    pay a pad copy)."""
    tables, dims = [], []
    for f in features:
        b, h, w, c = f.shape
        hp, wp = _padded_h(h), max(WIN, w)
        if hp > h or wp > w:
            f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        tables.append(f.reshape(b * hp, wp * c))
        dims.append((hp, wp))
    return tables, dims


def _prep(features, boxes, image_size, P: int, s: int, boxes_valid,
          table_scale):
    """Vectorized XLA prep: per-RoI class, DMA start indices, and the two
    fetch-relative bilinear weight matrices.

    Returns (idx [M, 4+S] i32, by [M, PP, WB] f32, ax [M, PP*WA] f32,
    static (S, WB, WA)).
    """
    b, n = boxes.shape[:2]
    m = b * n
    S = P * s
    heights, widths, scales, _ = _level_geometry(features, image_size)
    hp = np.array([_padded_h(f.shape[1]) for f in features], np.int32)
    wp = np.array([max(WIN, f.shape[2]) for f in features], np.int32)

    WB = max(WIN_F, TFETCH * S)   # stage-1 (y) weight width
    WA = max(WIN, 2 * S)          # stage-2 (x) weight width
    PP = _pad8(P)

    fb = boxes.reshape(m, 4)
    lvl = assign_levels(fb)
    lvl_scale = jnp.asarray(scales)[lvl]
    lvl_h = jnp.asarray(heights)[lvl]
    lvl_w = jnp.asarray(widths)[lvl]
    lvl_hp = jnp.asarray(hp)[lvl]
    lvl_wp = jnp.asarray(wp)[lvl]
    b_off = (jnp.arange(m, dtype=jnp.int32) // n) * lvl_hp

    x1 = fb[:, 0] * lvl_scale
    y1 = fb[:, 1] * lvl_scale
    roi_w = jnp.maximum(fb[:, 2] * lvl_scale - x1, 1.0)
    roi_h = jnp.maximum(fb[:, 3] * lvl_scale - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    bins = jnp.arange(P, dtype=jnp.float32)
    samp = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # sample index p = bin * s + sx  (flattened [M, S])
    off = (bins[:, None] + samp[None, :]).reshape(-1)  # [S]
    ys = y1[:, None] + off[None, :] * bin_h[:, None]
    xs = x1[:, None] + off[None, :] * bin_w[:, None]
    y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(ys, lvl_h[:, None])
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(xs, lvl_w[:, None])

    y_min, y_max = jnp.min(y_lo, 1), jnp.max(y_hi, 1)
    x_min, x_max = jnp.min(x_lo, 1), jnp.max(x_hi, 1)
    fits = (y_max - y_min < WIN) & (x_max - x_min < WIN)
    # exhaustive by the level-assignment product bound: !fits & y-span>=48
    # implies x-span < 24 (class T); !fits & x-span>=48 implies y-span < 24
    # (class W); both spans >= 48 is impossible (see module docstring).
    cls = jnp.where(fits, 0,
                    jnp.where(x_max - x_min < TSTRIP, 1, 2)).astype(jnp.int32)

    r0_a = jnp.clip(y_min, 0, lvl_hp - WIN)
    c0_a = jnp.clip(x_min, 0, lvl_wp - WIN)
    c0_t = jnp.clip(x_min, 0, lvl_wp - TSTRIP)
    r0_w = jnp.clip(y_min, 0, lvl_hp - TSTRIP)
    cp_w = jnp.minimum(x_lo, (lvl_wp - 2)[:, None])

    # 8-aligned fetch starts in absolute table rows (b_off is a multiple of
    # 8 because _padded_h is); clamped so the fixed-length fetch stays in
    # the table — the alignment slack (<= 7, <= 15 when clamped) is folded
    # into the fetch-relative weight positions below
    lvl_tot = b * lvl_hp
    abs_lo = y_lo + b_off[:, None]
    abs_hi = y_hi + b_off[:, None]
    a0_a = jnp.minimum(((r0_a + b_off) // 8) * 8, lvl_tot - WIN_F)
    at_p = jnp.minimum((abs_lo // 8) * 8, (lvl_tot - TFETCH)[:, None])
    a0_w = jnp.minimum(((r0_w + b_off) // 8) * 8, lvl_tot - WFETCH)

    row8 = jnp.where(cls == 0, a0_a, jnp.where(cls == 1, 0, a0_w)) // 8
    col0 = jnp.where(cls == 0, c0_a, jnp.where(cls == 1, c0_t, 0))
    pairs = jnp.where(cls[:, None] == 1, at_p // 8,
                      jnp.where(cls[:, None] == 2, cp_w, 0))
    idx = jnp.concatenate(
        [jnp.stack([cls, lvl, row8, col0], axis=1), pairs],
        axis=1).astype(jnp.int32)                              # [M, 4+S]

    # fetch-relative weight positions per class
    p_ar = 2 * jnp.arange(S, dtype=jnp.int32)[None, :]
    p16 = TFETCH * jnp.arange(S, dtype=jnp.int32)[None, :]
    rely_lo = jnp.where(cls[:, None] == 0, abs_lo - a0_a[:, None],
                        jnp.where(cls[:, None] == 1, p16 + (abs_lo - at_p),
                                  abs_lo - a0_w[:, None]))
    rely_hi = jnp.where(cls[:, None] == 0, abs_hi - a0_a[:, None],
                        jnp.where(cls[:, None] == 1, p16 + (abs_hi - at_p),
                                  abs_hi - a0_w[:, None]))
    relx_lo = jnp.where(cls[:, None] == 2, p_ar + (x_lo - cp_w),
                        x_lo - col0[:, None])
    relx_hi = jnp.where(cls[:, None] == 2, p_ar + (x_hi - cp_w),
                        x_hi - col0[:, None])

    inv = jnp.full((m,), 1.0 / (s * s), jnp.float32)
    if table_scale is not None:  # int8 tables: fold dequant into stage 1
        inv = inv * jnp.asarray(table_scale, jnp.float32)[lvl]
    if boxes_valid is not None:
        inv = inv * boxes_valid.reshape(m).astype(jnp.float32)

    def scatter(w_lo, w_hi, rel_lo, rel_hi, ok, width, extra):
        wl = (w_lo * ok)[:, :, None] * jax.nn.one_hot(rel_lo, width,
                                                      dtype=jnp.float32)
        wh = (w_hi * ok)[:, :, None] * jax.nn.one_hot(rel_hi, width,
                                                      dtype=jnp.float32)
        out = (wl + wh).reshape(m, P, s, width).sum(2)
        if extra is not None:
            out = out * extra[:, None, None]
        return jnp.pad(out, ((0, 0), (0, PP - P), (0, 0)))     # [M, PP, W]

    by = scatter(wy_lo, wy_hi, rely_lo, rely_hi,
                 y_ok.astype(jnp.float32), WB, inv)
    ax = scatter(wx_lo, wx_hi, relx_lo, relx_hi,
                 x_ok.astype(jnp.float32), WA, None).reshape(m, PP * WA)
    return idx, by, ax, (S, WB, WA, PP)


# ------------------------------------------------------------------- kernel
def _roi_kernel(idx_cur, idx_nxt, ax_ref, by_ref, t0, t1, t2, t3, out_ref,
                win_a, win_t, win_w, sem_a, sem_t, sem_w,
                *, P, s, C, S, WB, WA, PP, n_levels, cdt):
    tables = (t0, t1, t2, t3)[:n_levels]
    i = pl.program_id(0)
    m = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def run_dmas(idx_ref, sl, start):
        """Classes A and W: one fetch set per RoI, double-buffered across
        grid steps (started for RoI i+1 while RoI i computes).  Class T is
        handled at compute time (per-sample pipeline below)."""
        cls = idx_ref[0, 0, 0]
        lvl = idx_ref[0, 0, 1]

        def go(dma):
            dma.start() if start else dma.wait()

        for l in range(n_levels):
            @pl.when(jnp.logical_and(cls == 0, lvl == l))
            def _(l=l):
                r8 = idx_ref[0, 0, 2]
                c = idx_ref[0, 0, 3]
                go(pltpu.make_async_copy(
                    tables[l].at[pl.ds(r8 * 8, WIN_F), pl.ds(c * C, WIN * C)],
                    win_a.at[sl], sem_a.at[sl]))

            @pl.when(jnp.logical_and(cls == 2, lvl == l))
            def _(l=l):
                r8 = idx_ref[0, 0, 2]
                for p in range(S):
                    c = idx_ref[0, 0, 4 + p]
                    go(pltpu.make_async_copy(
                        tables[l].at[pl.ds(r8 * 8, WFETCH),
                                     pl.ds(c * C, 2 * C)],
                        win_w.at[sl, :, 2 * p * C:2 * (p + 1) * C],
                        sem_w.at[sl]))

    @pl.when(i == 0)
    def _():
        run_dmas(idx_cur, 0, True)

    @pl.when(i + 1 < m)
    def _():
        run_dmas(idx_nxt, nslot, True)

    run_dmas(idx_cur, slot, False)  # wait for this step's window

    cls = idx_cur[0, 0, 0]

    def x_interp(gy, cols):
        """out[:, bx*C:(bx+1)*C] = sum_k ax[bx, k] * gy[:, k*C:(k+1)*C]
        with static lane slices and SMEM scalar weights."""
        out_cols = []
        for bx in range(P):
            acc = None
            for k in cols(bx):
                term = ax_ref[0, 0, bx * WA + k] * gy[:, k * C:(k + 1) * C]
                acc = term if acc is None else acc + term
            out_cols.append(acc)
        return jnp.concatenate(out_cols, axis=1)  # [PP, P*C]

    # fp32 tables: force the 3-pass fp32-accurate MXU dot (default would
    # silently round operands to bf16); the kernel is DMA-bound so the
    # extra passes are free.  bf16 tables keep the single-pass dot.
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def emit(win_rows, win, cols):
        by = by_ref[0, :, :win_rows].astype(cdt)
        gy = jnp.dot(by, win[...].astype(cdt),
                     preferred_element_type=jnp.float32, precision=prec)
        out_ref[0] = x_interp(gy, cols).astype(out_ref.dtype)

    @pl.when(cls == 0)
    def _():
        emit(WIN_F, win_a[slot], lambda bx: range(WIN))

    for l in range(n_levels):
        # class T (tall): all samples share one 24-col strip but sit on
        # scattered row pairs; each sample's aligned [TFETCH, 24C] fetch is
        # pipelined through a 2-slot buffer and its y-contraction
        # accumulated — the sum over samples is exactly the single big
        # matmul the other classes do, taken 16 rows at a time
        @pl.when(jnp.logical_and(cls == 1, idx_cur[0, 0, 1] == l))
        def _(l=l):
            c = idx_cur[0, 0, 3]

            def t_dma(p, sl):
                r8 = idx_cur[0, 0, 4 + p]
                return pltpu.make_async_copy(
                    tables[l].at[pl.ds(r8 * 8, TFETCH),
                                 pl.ds(c * C, TSTRIP * C)],
                    win_t.at[sl], sem_t.at[sl])

            t_dma(0, 0).start()
            gy = jnp.zeros((PP, TSTRIP * C), jnp.float32)
            for p in range(S):
                sl = p % 2
                if p + 1 < S:
                    t_dma(p + 1, 1 - sl).start()
                t_dma(p, sl).wait()
                byp = by_ref[0, :, TFETCH * p:TFETCH * (p + 1)].astype(cdt)
                gy = gy + jnp.dot(byp, win_t[sl].astype(cdt),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
            out_ref[0] = x_interp(
                gy, lambda bx: range(TSTRIP)).astype(out_ref.dtype)

    @pl.when(cls == 2)
    def _():
        # wide: sample p = bx*s + sx occupies strip cols (2p, 2p+1)
        emit(WFETCH, win_w[slot],
             lambda bx: range(2 * s * bx, 2 * s * (bx + 1)))


# ---------------------------------------------------------------- entry
def pallas_multiscale_roi_align_batch(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    output_size: int,
    sampling_ratio: int = 2,
    boxes_valid: jnp.ndarray | None = None,
    quant: str | tuple | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for ``roi_align.multiscale_roi_align_batch`` (same semantics,
    same quant contract), computed by the Pallas window kernel.

    ``interpret=None`` resolves to the backend: compiled on TPU, interpreter
    elsewhere (so CPU tests exercise the identical program)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = boxes.shape[:2]
    m = b * n
    P = int(output_size)
    s = int(sampling_ratio)
    C = features[0].shape[-1]
    out_dtype = features[0].dtype

    table_scale = None
    if quant == "int8":
        features, table_scale = quantize_fpn_levels(features)
    elif isinstance(quant, tuple):
        features, table_scale = quant
    elif quant is not None:
        raise ValueError(f"unknown roi-pool quant mode `{quant}`")

    # Scratch windows are allocated at tables[0].dtype and DMA'd from every
    # level — Mosaic rejects a dtype-mixed DMA, so unify the levels first
    # (no-op unless a caller promoted one level, e.g. by adding an f32
    # scalar to it).
    if any(f.dtype != features[0].dtype for f in features[1:]):
        common = jnp.result_type(*[f.dtype for f in features])
        features = [f.astype(common) for f in features]
        out_dtype = common

    idx, by, ax, (S, WB, WA, PP) = _prep(
        features, boxes, image_size, P, s, boxes_valid, table_scale)
    tables, _ = _make_tables(features)
    # compute dtype: match the XLA path — bf16 tables compute in bf16,
    # f32 AND int8 tables in f32 (int8 dequant weights need f32 precision)
    cdt = jnp.bfloat16 if tables[0].dtype == jnp.bfloat16 else jnp.float32
    n_levels = len(tables)
    assert n_levels <= 4, "kernel supports up to 4 FPN levels"
    # pad the table tuple to 4 refs so the kernel signature is static
    while len(tables) < 4:
        tables = tables + [tables[-1]]

    kernel = functools.partial(
        _roi_kernel, P=P, s=s, C=C, S=S, WB=WB, WA=WA, PP=PP,
        n_levels=n_levels, cdt=cdt)

    # rank-3 with a singleton middle axis: Mosaic only accepts a windowed
    # SMEM block when its last two dims divide (8, 128) or EQUAL the array
    # dims — (1, 1, K) blocks over (m, 1, K) arrays satisfy the equality arm
    idx = idx.reshape(m, 1, 4 + S)
    ax = ax.reshape(m, 1, PP * WA)
    in_specs = [
            pl.BlockSpec((1, 1, 4 + S), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4 + S),
                         lambda i: (jnp.minimum(i + 1, m - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, PP * WA), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, PP, WB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4
    out = pl.pallas_call(
        kernel,
        grid=(m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, PP, P * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, PP, P * C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_F, WIN * C), tables[0].dtype),
            pltpu.VMEM((2, TFETCH, TSTRIP * C), tables[0].dtype),
            pltpu.VMEM((2, WFETCH, 2 * S * C), tables[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx, idx, ax, by, *tables)
    return out[:, :P].reshape(b, n, P, P, C)


# ------------------------------------------------------------- trainable VJP
@functools.lru_cache(maxsize=None)
def _make_vjp_pool(image_size: Tuple[int, int], P: int, s: int):
    """Build (and cache per static geometry) the custom-VJP pooling fn.

    Forward = the Pallas window kernel above; backward = the linear
    transpose of the XLA gather program (``roi_align.multiscale_roi_align_
    batch``) applied to the cotangent — RoIAlign is linear in the features
    for fixed boxes, and both programs compute the identical linear map
    (parity 4.5e-5, tests/test_pallas_roi.py), so transposing the XLA one
    is exact.  ``jax.linear_transpose`` never executes the forward, so the
    backward costs ONLY the scatter-add (measured ~46 ms at batch 16x512
    832x1344 vs the 87 ms XLA forward it replaces — BASELINE.md round-4
    supervised-step table).

    Boxes and the validity weights get zero cotangents: torchvision's
    ``roi_align`` autograd likewise has no ``rois`` gradient (the reference
    trains through torchvision RoIHeads,
    /root/reference/src/models/org/rcnn.py:196-199), and the train path
    stop-gradients proposals at the RPN anyway.
    """
    from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align_batch

    @jax.custom_vjp
    def pool(feats, boxes, vweight):
        return pallas_multiscale_roi_align_batch(
            list(feats), boxes, image_size, P, s, boxes_valid=vweight)

    def fwd(feats, boxes, vweight):
        shapes = tuple(jax.ShapeDtypeStruct(f.shape, f.dtype) for f in feats)
        return pool(feats, boxes, vweight), (shapes, boxes, vweight)

    def bwd(res, g):
        shapes, boxes, vweight = res

        def lin(fs):
            return multiscale_roi_align_batch(
                list(fs), boxes, image_size, P, s, boxes_valid=vweight)

        (df,) = jax.linear_transpose(lin, shapes)(g)
        return (tuple(df), jnp.zeros_like(boxes), jnp.zeros_like(vweight))

    pool.defvjp(fwd, bwd)
    return pool


def pallas_multiscale_roi_align_batch_vjp(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    output_size: int,
    sampling_ratio: int = 2,
    boxes_valid: jnp.ndarray | None = None,
    quant: str | tuple | None = None,
) -> jnp.ndarray:
    """Differentiable-wrt-features Pallas pooling for the TRAIN path.

    Same signature/semantics as ``pallas_multiscale_roi_align_batch`` (the
    ``quant`` arg is accepted for dispatch symmetry but must be None — int8
    tables are an eval-only lever).  See ``_make_vjp_pool`` for the VJP
    construction.
    """
    if quant is not None:
        raise ValueError("int8 pooling tables are eval-only; the train path"
                         " differentiates through the features")
    vw = (jnp.ones(boxes.shape[:2], jnp.float32) if boxes_valid is None
          else boxes_valid.astype(jnp.float32))
    pool = _make_vjp_pool((int(image_size[0]), int(image_size[1])),
                          int(output_size), int(sampling_ratio))
    return pool(tuple(features), boxes, vw)
