"""RLE mask utilities: ctypes binding to the native cocomask library with a
pure-numpy fallback.

Replaces pycocotools' C extension surface the reference consumes
(mask encode/decode/area/IoU — src/utils/coco_eval_util.py:107-111,
src/utils/coco_util.py:33-47).  The native library (native/cocomask/
cocomask.cpp, built by tools/build_native.sh) computes run-merge IoU without
materializing masks — the hot path of segm evaluation.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.path.join(here, "..", "..", "build", "libcocomask.so"),
        os.path.join(os.getcwd(), "build", "libcocomask.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _find_lib()
        if path:
            lib = ctypes.CDLL(path)
            u32p = ctypes.POINTER(ctypes.c_uint32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.rle_encode.restype = ctypes.c_int64
            lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u32p]
            lib.rle_decode.restype = None
            lib.rle_decode.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, u8p]
            lib.rle_area.restype = ctypes.c_int64
            lib.rle_area.argtypes = [u32p, ctypes.c_int64]
            lib.rle_iou_matrix.restype = None
            lib.rle_iou_matrix.argtypes = [u32p, i64p, ctypes.c_int64,
                                           u32p, i64p, ctypes.c_int64,
                                           i32p, f64p]
            lib.fill_polygon.restype = None
            lib.fill_polygon.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int64, u8p]
            if hasattr(lib, "poly_to_rle"):
                lib.poly_to_rle.restype = ctypes.c_int64
                lib.poly_to_rle.argtypes = [f64p, ctypes.c_int64,
                                            ctypes.c_int64, ctypes.c_int64,
                                            u32p, ctypes.c_int64]
            lib.coco_match.restype = None
            lib.coco_match.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                                       u8p, f64p, ctypes.c_int64, i32p]
            _LIB = lib
    return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# Public API (native when available, numpy fallback otherwise)
# ---------------------------------------------------------------------------

def encode(mask: np.ndarray) -> np.ndarray:
    """Binary [h, w] mask -> column-major run lengths (uint32)."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty(h * w + 1, dtype=np.uint32)
        n = lib.rle_encode(_ptr(mask, ctypes.c_uint8), h, w,
                           _ptr(out, ctypes.c_uint32))
        return out[:n].copy()
    flat = mask.T.reshape(-1)
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).astype(np.uint32)
    if flat[0] != 0:  # runs must start with a zero-run
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


def decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, dtype=np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.zeros(h * w, dtype=np.uint8).reshape(h, w)
        lib.rle_decode(_ptr(counts, ctypes.c_uint32), len(counts), h, w,
                       _ptr(out, ctypes.c_uint8))
        return out
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts:
        flat[pos:pos + int(c)] = val
        pos += int(c)
        val = 1 - val
    return flat.reshape(w, h).T


def area(counts: np.ndarray) -> int:
    counts = np.ascontiguousarray(counts, dtype=np.uint32)
    lib = get_lib()
    if lib is not None:
        return int(lib.rle_area(_ptr(counts, ctypes.c_uint32), len(counts)))
    return int(counts[1::2].sum())


def iou_matrix(det_rles: Sequence[np.ndarray], gt_rles: Sequence[np.ndarray],
               iscrowd: np.ndarray) -> np.ndarray:
    """IoU between RLE sets over a shared canvas; crowd gt -> inter/det."""
    n_det, n_gt = len(det_rles), len(gt_rles)
    if n_det == 0 or n_gt == 0:
        return np.zeros((n_det, n_gt))
    lib = get_lib()
    iscrowd = np.ascontiguousarray(iscrowd, dtype=np.int32)
    if lib is not None:
        det_runs = np.concatenate([np.asarray(r, np.uint32) for r in det_rles])
        gt_runs = np.concatenate([np.asarray(r, np.uint32) for r in gt_rles])
        det_off = np.concatenate(
            [[0], np.cumsum([len(r) for r in det_rles])]).astype(np.int64)
        gt_off = np.concatenate(
            [[0], np.cumsum([len(r) for r in gt_rles])]).astype(np.int64)
        out = np.zeros((n_det, n_gt), dtype=np.float64)
        lib.rle_iou_matrix(
            _ptr(np.ascontiguousarray(det_runs), ctypes.c_uint32),
            _ptr(det_off, ctypes.c_int64), n_det,
            _ptr(np.ascontiguousarray(gt_runs), ctypes.c_uint32),
            _ptr(gt_off, ctypes.c_int64), n_gt,
            _ptr(iscrowd, ctypes.c_int32), _ptr(out, ctypes.c_double))
        return out
    # numpy fallback: run-length intersection via prefix logic is fiddly;
    # areas + pairwise min over decoded masks
    out = np.zeros((n_det, n_gt))
    # infer canvas from total run length (h unknown: store as 1-D)
    for i, d in enumerate(det_rles):
        dlen = int(np.sum(d))
        dmask = np.zeros(dlen, bool)
        pos = 0
        val = False
        for c in d:
            if val:
                dmask[pos:pos + int(c)] = True
            pos += int(c)
            val = not val
        da = dmask.sum()
        for j, g in enumerate(gt_rles):
            gmask = np.zeros(int(np.sum(g)), bool)
            pos = 0
            val = False
            for c in g:
                if val:
                    gmask[pos:pos + int(c)] = True
                pos += int(c)
                val = not val
            n = min(len(dmask), len(gmask))
            inter = np.logical_and(dmask[:n], gmask[:n]).sum()
            ga = gmask.sum()
            denom = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def poly_to_rle(xy: Sequence[float], h: int, w: int) -> np.ndarray:
    """COCO polygon -> column-major RLE, bit-exact with pycocotools'
    rleFrPoly (5x-upsampled boundary walk -> column-crossing downsample ->
    sorted-diff run encoding).  This is the rasterization COCO ground truth
    was published with; use it wherever numbers must match pycocotools."""
    pts = np.ascontiguousarray(xy, dtype=np.float64).reshape(-1)
    k = len(pts) // 2
    lib = get_lib()
    if lib is not None and hasattr(lib, "poly_to_rle"):
        max_counts = int(h * w + 2 + 4 * k * 5)
        out = np.empty(max_counts, dtype=np.uint32)
        n = lib.poly_to_rle(_ptr(pts, ctypes.c_double), k, h, w,
                            _ptr(out, ctypes.c_uint32), max_counts)
        if n >= 0:
            return out[:n].copy()
    return _poly_to_rle_np(pts, k, h, w)


def _poly_to_rle_np(pts: np.ndarray, k: int, h: int, w: int) -> np.ndarray:
    """Numpy implementation of the same algorithm (the spec for the native
    path; tests assert bit-equality between the two)."""
    if k < 3:
        return np.asarray([h * w], dtype=np.uint32)
    scale = 5.0
    x = (scale * pts[0::2] + 0.5).astype(np.int64)
    y = (scale * pts[1::2] + 0.5).astype(np.int64)
    x = np.append(x, x[0])
    y = np.append(y, y[0])
    us: List[np.ndarray] = []
    vs: List[np.ndarray] = []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            d = np.arange(dx + 1, dtype=np.int64)
            t = dx - d if flip else d
            us.append(t + xs)
            vs.append((ys + s * t + 0.5).astype(np.int64))
        else:
            s = (xe - xs) / dy if dy else 0.0
            d = np.arange(dy + 1, dtype=np.int64)
            t = dy - d if flip else d
            vs.append(t + ys)
            us.append((xs + s * t + 0.5).astype(np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)
    # column-boundary crossings, downsampled
    change = u[1:] != u[:-1]
    uj, up = u[1:][change], u[:-1][change]
    vj, vp = v[1:][change], v[:-1][change]
    xd = np.where(uj < up, uj, uj - 1).astype(np.float64)
    xd = (xd + 0.5) / scale - 0.5
    keep = (np.floor(xd) == xd) & (xd >= 0) & (xd <= w - 1)
    yd = np.minimum(vj, vp).astype(np.float64)
    yd = (yd + 0.5) / scale - 0.5
    yd = np.ceil(np.clip(yd, 0, h))
    cx = xd[keep].astype(np.int64)
    cy = yd[keep].astype(np.int64)
    a = np.sort(cx * h + cy).astype(np.uint32)
    a = np.append(a, np.uint32(h * w))
    a = np.diff(a, prepend=np.uint32(0)).astype(np.uint32)
    # merge zero runs (a zero means two crossings at the same position —
    # they cancel and their neighbors fuse)
    b: List[int] = [int(a[0])]
    j = 1
    n = len(a)
    while j < n:
        if a[j] > 0:
            b.append(int(a[j]))
            j += 1
        else:
            j += 1
            if j < n:
                b[-1] += int(a[j])
                j += 1
    return np.asarray(b, dtype=np.uint32)


def fill_polygon(xy: Sequence[float], h: int, w: int,
                 mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Even-odd scanline polygon fill at pixel centers (unions into mask)."""
    if mask is None:
        mask = np.zeros((h, w), dtype=np.uint8)
    lib = get_lib()
    pts = np.ascontiguousarray(xy, dtype=np.float64).reshape(-1)
    if lib is not None:
        lib.fill_polygon(_ptr(pts, ctypes.c_double), len(pts) // 2, h, w,
                         _ptr(mask, ctypes.c_uint8))
        return mask
    # numpy fallback: PIL polygon (slightly different boundary rule)
    from PIL import Image, ImageDraw
    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).polygon([float(v) for v in pts], outline=1, fill=1)
    mask |= np.asarray(img, dtype=np.uint8)
    return mask
