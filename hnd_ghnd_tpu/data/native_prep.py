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
            lib.prep_image.restype = None
            lib.prep_image.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64,   # sh, sw
                ctypes.c_int64, ctypes.c_int64,   # nh, nw
                ctypes.c_int32,                   # flip
                ctypes.c_int64, ctypes.c_int64,   # bh, bw
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
    return _LIB


def available() -> bool:
    if os.environ.get("HND_TPU_NATIVE_PREP", "1") != "1":
        return False
    return get_lib() is not None


def prep_into(src_u8: np.ndarray, nh: int, nw: int, flip: bool,
              out_slot: np.ndarray) -> None:
    """Resize (bilinear, half-pixel centers) + optional hflip + /255 +
    zero-pad src into out_slot ([bh, bw, 3] float32, C-contiguous)."""
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    assert src.ndim == 3 and src.shape[2] == 3, src.shape
    assert out_slot.dtype == np.float32 and out_slot.flags.c_contiguous
    bh, bw = out_slot.shape[:2]
    get_lib().prep_image(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1], nh, nw, int(bool(flip)), bh, bw,
        out_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
