"""JPEG wire codec for RGB payloads (host-side).

Parity surface: src/structure/transformer.py JpegCompressor/JpegDecompressor
(:94-128) — quantize an RGB tensor to uint8, JPEG-encode it, and reconstruct
the float tensor from the decoded bytes using the stored scale/zero-point.
The reference writes temp files; this implementation keeps the payload in
memory (bytes are the wire format), which is what a real edge deployment
sends.

These are host-side components (libjpeg via PIL).  When a
``bottleneck_transformer`` config names a JPEG component,
get_bottleneck_transformer (codec/quantizer.py) builds a host-side chain
from these classes and the model routes the bottleneck tensor through it
with jax.pure_callback (models/bottleneck.py) — so JPEG configs run
in-model like the reference's.  They also serve host pipelines directly
(cost_analyzer payload studies, RGB-input split deployments).
"""
from __future__ import annotations

import io
from typing import NamedTuple

import numpy as np
from PIL import Image


class HostQuantizedTensor(NamedTuple):
    """numpy twin of codec.quantizer.QuantizedTensor for host-side chains."""
    tensor: np.ndarray
    scale: float
    zero_point: float


def _quantize_np(x: np.ndarray, num_bits: int = 8):
    qmin, qmax = np.float32(0.0), np.float32(2.0 ** num_bits - 1.0)
    mn = x.astype(np.float32).min()
    mx = x.astype(np.float32).max()
    scale = np.float32((mx - mn) / (qmax - qmin))
    if not scale > 0:  # constant tensor: scale=1 guard (no NaNs on the wire)
        scale = np.float32(1.0)
    zp = float(int(np.clip(np.float32(-mn / scale), qmin, qmax)))
    q = np.clip(np.float32(zp) + x.astype(np.float32) / scale,
                qmin, qmax).round().astype(np.uint8)
    return q, float(scale), zp


class HostQuantizer:
    """numpy twin of codec.quantizer.Quantizer (bit-exact arithmetic) for
    host-side transformer chains that include JPEG components."""

    def __init__(self, num_bits: int = 8):
        self.num_bits = num_bits

    def __call__(self, z, target=None):
        if self.num_bits == 16:
            return np.asarray(z, np.float16), target
        q, scale, zp = _quantize_np(np.asarray(z), self.num_bits)
        return HostQuantizedTensor(q, scale, zp), target


class HostDequantizer:
    def __init__(self, num_bits: int = 8):
        self.num_bits = num_bits

    def __call__(self, qz, target=None):
        if self.num_bits == 16:
            return np.asarray(qz, np.float32), target
        if not isinstance(qz, HostQuantizedTensor):
            return qz, target
        return (np.float32(qz.scale)
                * (qz.tensor.astype(np.float32) - np.float32(qz.zero_point)),
                target)


class JpegCompressor:
    """RGB [H, W, 3] (or [1, H, W, 3]) float tensor -> (jpeg bytes, scale,
    zero_point).  Non-RGB payloads pass through untouched (reference
    behavior, transformer.py:117-124)."""

    def __init__(self, jpeg_quality: int = 95):
        self.jpeg_quality = jpeg_quality

    def __call__(self, z, target=None):
        if isinstance(z, (tuple, bytes, bytearray)):
            return z, target  # quantized record / encoded payload: untouched
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
