"""JPEG wire codec for RGB payloads (host-side).

Parity surface: src/structure/transformer.py JpegCompressor/JpegDecompressor
(:94-128) — quantize an RGB tensor to uint8, JPEG-encode it, and reconstruct
the float tensor from the decoded bytes using the stored scale/zero-point.
The reference writes temp files; this implementation keeps the payload in
memory (bytes are the wire format), which is what a real edge deployment
sends.

These are host-side components (libjpeg via PIL); they cannot run inside a
jitted model, so get_bottleneck_transformer (codec/quantizer.py) rejects
them for the in-model transformer and they are used by host pipelines (e.g.
cost_analyzer payload studies, RGB-input split deployments).
"""
from __future__ import annotations

import io

import numpy as np
from PIL import Image



def _quantize_np(x: np.ndarray, num_bits: int = 8):
    qmin, qmax = np.float32(0.0), np.float32(2.0 ** num_bits - 1.0)
    mn = x.astype(np.float32).min()
    mx = x.astype(np.float32).max()
    scale = np.float32((mx - mn) / (qmax - qmin))
    zp = float(int(np.clip(np.float32(-mn / scale), qmin, qmax)))
    q = np.clip(np.float32(zp) + x.astype(np.float32) / scale,
                qmin, qmax).round().astype(np.uint8)
    return q, float(scale), zp


class JpegCompressor:
    """RGB [H, W, 3] (or [1, H, W, 3]) float tensor -> (jpeg bytes, scale,
    zero_point).  Non-RGB payloads pass through untouched (reference
    behavior, transformer.py:117-124)."""

    def __init__(self, jpeg_quality: int = 95):
        self.jpeg_quality = jpeg_quality

    def __call__(self, z, target=None):
        arr = np.asarray(z)
        if arr.ndim == 4 and arr.shape[0] == 1 and arr.shape[-1] == 3:
            arr = arr[0]
        if not (arr.ndim == 3 and arr.shape[-1] == 3):
            return z, target
        q, scale, zp = _quantize_np(arr)
        buf = io.BytesIO()
        Image.fromarray(q).save(buf, format="jpeg", quality=self.jpeg_quality)
        return (buf.getvalue(), scale, zp), target


class JpegDecompressor:
    """(jpeg bytes, scale, zero_point) -> reconstructed float tensor."""

    def __init__(self, target_dim: int = 4):
        self.target_dim = target_dim

    def __call__(self, z, target=None):
        if not (isinstance(z, tuple) and len(z) == 3
                and isinstance(z[0], (bytes, bytearray))):
            return z, target
        payload, scale, zp = z
        img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"),
                         dtype=np.float32)
        out = scale * (img - zp)
        if self.target_dim == 4:
            out = out[None]
        return out, target
