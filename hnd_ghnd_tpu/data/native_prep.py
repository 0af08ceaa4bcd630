"""ctypes binding for the native fused image-prep kernel (libprep.so).

One C call per image replaces the numpy/cv2 chain resize -> flip -> pad ->
/255 with a single pass from the decoded uint8 buffer into the padded
float32 batch slot (native/pipeline/prep.cpp).  The call releases the GIL,
so the loader's decode thread pool scales across cores like the reference's
torch DataLoader C++ workers.  Falls back transparently when the library
isn't built (loader keeps the pure-Python path).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.path.join(here, "..", "..", "build", "libprep.so"),
        os.path.join(os.getcwd(), "build", "libprep.so"),
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
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.prep_image.restype = None
            lib.prep_image.argtypes = [
                u8p,
                ctypes.c_int64, ctypes.c_int64,   # sh, sw
                ctypes.c_int64, ctypes.c_int64,   # nh, nw
                ctypes.c_int32,                   # flip
                ctypes.c_int64, ctypes.c_int64,   # bh, bw
                ctypes.POINTER(ctypes.c_float),
            ]
            if hasattr(lib, "prep_image_u8"):  # older .so: f32 path only
                lib.prep_image_u8.restype = None
                lib.prep_image_u8.argtypes = (
                    lib.prep_image.argtypes[:-1] + [u8p])
            if hasattr(lib, "jpeg_decode"):
                lib.jpeg_info.restype = ctypes.c_int64
                lib.jpeg_info.argtypes = [u8p, ctypes.c_int64, i64p, i64p]
                lib.jpeg_decode.restype = ctypes.c_int64
                lib.jpeg_decode.argtypes = [u8p, ctypes.c_int64, u8p,
                                            ctypes.c_int64, ctypes.c_int64]
            _LIB = lib
    return _LIB


def available() -> bool:
    if os.environ.get("HND_TPU_NATIVE_PREP", "1") != "1":
        return False
    return get_lib() is not None


def supports_u8() -> bool:
    """True when the built .so has the uint8-wire prep entry point."""
    return available() and hasattr(get_lib(), "prep_image_u8")


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Native libjpeg decode to RGB uint8 [h, w, 3]; None on any failure
    (caller falls back to PIL — e.g. PNGs, exotic colorspaces)."""
    lib = get_lib()
    if (lib is None or not hasattr(lib, "jpeg_decode")
            or os.environ.get("HND_TPU_NATIVE_PREP", "1") != "1"):
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if lib.jpeg_info(src, len(buf), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode(src, len(buf),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         h.value, w.value)
    return out if rc == 0 else None


def prep_into(src_u8: np.ndarray, nh: int, nw: int, flip: bool,
              out_slot: np.ndarray) -> None:
    """Resize (bilinear, half-pixel centers) + optional hflip + zero-pad
    src into out_slot ([bh, bw, 3], C-contiguous).  float32 slot: values
    normalized to [0, 1].  uint8 slot (the u8-wire mode): rounded codes —
    4x less host/H2D traffic; the jit boundary dequantizes (*1/255)."""
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    assert src.ndim == 3 and src.shape[2] == 3, src.shape
    assert out_slot.dtype in (np.float32, np.uint8), out_slot.dtype
    assert out_slot.flags.c_contiguous
    bh, bw = out_slot.shape[:2]
    # bounds-check before crossing into C: prep.cpp zero-pads with
    # memset(row + nw*3, 0, (bw-nw)*3*4) — a (bw-nw) < 0 would wrap to a
    # huge size_t (native heap overflow), not a Python exception
    assert 1 <= nh <= bh and 1 <= nw <= bw, (nh, nw, bh, bw)
    if out_slot.dtype == np.uint8:
        get_lib().prep_image_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            src.shape[0], src.shape[1], nh, nw, int(bool(flip)), bh, bw,
            out_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    else:
        get_lib().prep_image(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            src.shape[0], src.shape[1], nh, nw, int(bool(flip)), bh, bw,
            out_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
