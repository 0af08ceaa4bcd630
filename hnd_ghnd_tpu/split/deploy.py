"""Split-computing deployment: edge HEAD / server TAIL programs.

Capability parity: src/models/mimic/split_rcnn.py — the trained bottleneck
detector splits into a mobile head (preprocess + stem + layer1-encoder +
optional ext gate + 8-bit quantizer, :13-37) and a server tail (dequantizer +
layer1-decoder + layers2-4 + FPN + RPN + RoIHeads + postprocess, :162-212).
Only the quantized bottleneck tensor plus shape metadata crosses the network
(:37: the wire tuple).  The reference rewrites its AnchorGenerator/RPN to
work from image *sizes* instead of pixels (:76-159); in this framework that
property is inherent — anchors derive from the static bucket geometry.

Here head and tail are two independently-jitted XLA programs with an
explicit byte-level wire format between them, i.e. genuinely deployable as
separate processes/devices, not a module split inside one graph.
"""
from __future__ import annotations

import json
import struct
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnd_ghnd_tpu.codec.quantizer import QuantizedTensor, quantize_tensor, dequantize_tensor
from hnd_ghnd_tpu.models.rcnn import RCNN

Params = Dict[str, Any]

_MAGIC = b"HGW1"  # hnd-ghnd wire format v1

# The wire crosses a real network boundary (edge -> server), so the decoder
# must fail clean on malformed input instead of reshaping attacker-controlled
# bytes into whatever the header claims.  Only these payload dtypes are ever
# produced by head_fn (8-bit quant, fp16 wire, fp32 no-quant):
_WIRE_DTYPES = ("uint8", "float16", "float32")
_MAX_META_BYTES = 1 << 20          # metadata is a few hundred bytes in practice
_MAX_TENSOR_BYTES = 1 << 31        # 2 GB — far above any real bottleneck


class WireError(ValueError):
    """Malformed split-wire packet (bad magic / truncation / inconsistent
    metadata).  The server tail raises this instead of crashing deeper in
    numpy/XLA on attacker-controlled bytes."""


class WirePacket(NamedTuple):
    """What crosses the edge->server boundary (plus static bucket shape
    carried in the header)."""
    tensor: np.ndarray        # uint8 [B, H', W', C'] (or fp16 when bits=16)
    scale: float
    zero_point: float
    image_sizes: np.ndarray   # [B, 2] valid sizes in the padded bucket
    original_sizes: np.ndarray  # [B, 2]
    ext_logits: Optional[np.ndarray]  # [B, 2] or None


def pack_wire(p: WirePacket) -> bytes:
    meta = {
        "dtype": str(p.tensor.dtype), "shape": list(p.tensor.shape),
        "scale": float(p.scale), "zero_point": float(p.zero_point),
        "image_sizes": np.asarray(p.image_sizes).tolist(),
        "original_sizes": np.asarray(p.original_sizes).tolist(),
        "ext": None if p.ext_logits is None
               else np.asarray(p.ext_logits).tolist(),
    }
    mb = json.dumps(meta).encode()
    body = np.ascontiguousarray(p.tensor).tobytes()
    return _MAGIC + struct.pack("<I", len(mb)) + mb + body


def _sizes_array(meta: dict, key: str, batch: int) -> np.ndarray:
    try:
        arr = np.asarray(meta[key], np.int32)
    except (KeyError, TypeError, ValueError, OverflowError) as e:
        raise WireError(f"wire metadata `{key}` is not an int array") from e
    if arr.shape != (batch, 2) or (arr <= 0).any():
        raise WireError(f"wire metadata `{key}` has shape {arr.shape}, "
                        f"expected ({batch}, 2) of positive sizes")
    return arr


def unpack_wire(buf: bytes) -> WirePacket:
    """Decode (and validate) a wire packet.

    Every corruption class fails with ``WireError`` before any bytes are
    interpreted as tensor data: wrong magic, truncated header/metadata/body,
    oversized or non-JSON metadata, dtypes outside the head's output set,
    and shape metadata inconsistent with the body length.
    """
    if len(buf) < 8:
        raise WireError(f"wire packet truncated: {len(buf)} bytes < 8-byte header")
    if buf[:4] != _MAGIC:
        raise WireError(f"bad wire magic {buf[:4]!r} (expected {_MAGIC!r})")
    (mlen,) = struct.unpack("<I", buf[4:8])
    if mlen > _MAX_META_BYTES:
        raise WireError(f"wire metadata length {mlen} exceeds "
                        f"{_MAX_META_BYTES} byte cap")
    if len(buf) < 8 + mlen:
        raise WireError(f"wire packet truncated inside metadata "
                        f"({len(buf)} bytes, header claims {mlen})")
    try:
        meta = json.loads(buf[8:8 + mlen].decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise WireError("wire metadata is not valid JSON") from e
    if not isinstance(meta, dict):
        raise WireError("wire metadata is not a JSON object")

    dtype_name = meta.get("dtype")
    if dtype_name not in _WIRE_DTYPES:
        raise WireError(f"wire dtype {dtype_name!r} not in {_WIRE_DTYPES}")
    dtype = np.dtype(dtype_name)
    shape = meta.get("shape")
    if (not isinstance(shape, list) or len(shape) != 4
            or not all(isinstance(d, int) and d > 0 for d in shape)):
        raise WireError(f"wire tensor shape {shape!r} is not a positive "
                        "4-entry [B, H, W, C] list")
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if nbytes > _MAX_TENSOR_BYTES:
        raise WireError(f"wire tensor claims {nbytes} bytes, above the "
                        f"{_MAX_TENSOR_BYTES} cap")
    body = buf[8 + mlen:]
    if len(body) != nbytes:
        raise WireError(f"wire body is {len(body)} bytes but shape/dtype "
                        f"metadata implies {nbytes}")
    try:
        scale = float(meta["scale"])
        zero_point = float(meta["zero_point"])
    except (KeyError, TypeError, ValueError) as e:
        raise WireError("wire scale/zero_point missing or non-numeric") from e
    tensor = np.frombuffer(body, dtype=dtype).reshape(shape)
    image_sizes = _sizes_array(meta, "image_sizes", shape[0])
    original_sizes = _sizes_array(meta, "original_sizes", shape[0])
    ext = meta.get("ext")
    if ext is not None:
        try:
            ext = np.asarray(ext, np.float32)
        except (TypeError, ValueError) as e:
            raise WireError("wire ext logits are not a float array") from e
        if ext.shape != (shape[0], 2):
            raise WireError(f"wire ext logits have shape {ext.shape}, "
                            f"expected ({shape[0]}, 2)")
    return WirePacket(tensor, scale, zero_point, image_sizes, original_sizes,
                      ext)


def _split_head_params(params: Params) -> Params:
    body = params["backbone"]["body"]
    head_layer1 = {"encoder": body["layer1"]["encoder"]}
    if "ext_classifier" in body["layer1"]:
        head_layer1["ext_classifier"] = body["layer1"]["ext_classifier"]
    return {"backbone": {"body": {
        "conv1": body["conv1"], "bn1": body["bn1"], "layer1": head_layer1}}}


def _split_tail_params(params: Params) -> Params:
    body = params["backbone"]["body"]
    return {
        "backbone": {
            "body": {"layer1": {"decoder": body["layer1"]["decoder"]},
                     "layer2": body["layer2"], "layer3": body["layer3"],
                     "layer4": body["layer4"]},
            "fpn": params["backbone"]["fpn"],
        },
        "rpn": params["rpn"],
        "roi_heads": params["roi_heads"],
    }


class SplitRCNN:
    """Builds the two jitted programs from a trained bottleneck RCNN."""

    def __init__(self, model: RCNN, quant_bits: Optional[int] = 8):
        assert model.bottleneck is not None, \
            "split deployment requires a bottleneck (custom_resnet) model"
        self.model = model
        self.quant_bits = quant_bits

    # ----------------------------------------------------------------- head
    def head_fn(self, head_params: Params, head_state: Params,
                images: jnp.ndarray):
        """normalize -> stem -> encoder (-> ext) -> quantize.
        Returns (q_tensor, scale, zero_point, ext_logits_or_zeros)."""
        model = self.model
        x = model.normalize(images)
        body_p = head_params["backbone"]["body"]
        body_s = head_state["backbone"]["body"]
        y = model.body.stem(body_p, x)
        bott = model.bottleneck
        ext_logits = jnp.zeros((images.shape[0], 2), jnp.float32)
        if bott.ext is not None:
            ext_logits, _ = bott.ext.apply(
                body_p["layer1"]["ext_classifier"],
                body_s["layer1"]["ext_classifier"], y, training=False)
        z, _ = bott.encode(body_p["layer1"], body_s["layer1"], y,
                           training=False)
        if self.quant_bits is None:
            return z, jnp.float32(1.0), jnp.float32(0.0), ext_logits
        if self.quant_bits == 16:
            return (z.astype(jnp.float16), jnp.float32(1.0), jnp.float32(0.0),
                    ext_logits)
        q = quantize_tensor(z, self.quant_bits)
        return q.tensor, q.scale, q.zero_point, ext_logits

    # ----------------------------------------------------------------- tail
    def tail_fn(self, tail_params: Params, tail_state: Params,
                q_tensor: jnp.ndarray, scale: jnp.ndarray,
                zero_point: jnp.ndarray, image_sizes: jnp.ndarray,
                bucket_hw: Tuple[int, int]):
        """dequantize -> decoder -> layers2-4 -> FPN -> RPN -> RoI heads.
        Returns the fixed-shape detection dict (padded-bucket coords)."""
        model = self.model
        if self.quant_bits is None:
            z = q_tensor
        elif self.quant_bits == 16:
            z = q_tensor.astype(jnp.float32)
        else:
            z = dequantize_tensor(
                QuantizedTensor(q_tensor, scale, zero_point))
        body_p = tail_params["backbone"]["body"]
        body_s = tail_state["backbone"]["body"]
        y, _ = model.bottleneck.decode(body_p["layer1"], body_s["layer1"], z,
                                       training=False)
        feats = [y]
        for stage in (1, 2, 3):
            y = model.body._apply_stage(body_p, y, stage)
            feats.append(y)
        fpn_feats = model.fpn.apply(tail_params["backbone"]["fpn"], feats)
        proposals, prop_valid, _ = model.rpn.propose(
            tail_params["rpn"], fpn_feats, image_sizes, bucket_hw,
            training=False)
        dets = model.roi_heads.infer(
            tail_params["roi_heads"], fpn_feats, proposals, prop_valid,
            image_sizes, bucket_hw)
        return dets

    # ------------------------------------------------------------ compiled
    def build(self, params: Params, state: Params):
        """Split params/state and return (head_call, tail_call) jitted fns.

        head_call(images [B,H,W,3] float in [0,1]) -> WirePacket fields
        tail_call(packet fields...) -> detection dict
        """
        head_params = _split_head_params(params)
        tail_params = _split_tail_params(params)
        head_state = {"backbone": {"body": {
            "layer1": state["backbone"]["body"]["layer1"]}}}
        tail_state = head_state

        head_jit = jax.jit(lambda im: self.head_fn(head_params, head_state, im))

        tail_cache: Dict[Tuple[int, int], Any] = {}

        def tail_call(q_tensor, scale, zero_point, image_sizes, bucket_hw):
            key = tuple(bucket_hw)
            if key not in tail_cache:
                tail_cache[key] = jax.jit(
                    lambda q, s, zp, sz: self.tail_fn(
                        tail_params, tail_state, q, s, zp, sz, key))
            return tail_cache[key](q_tensor, jnp.float32(scale),
                                   jnp.float32(zero_point),
                                   jnp.asarray(image_sizes))
        return head_jit, tail_call, (head_params, tail_params)

    # ------------------------------------------------------- host protocol
    def run_edge(self, head_jit, images: np.ndarray, image_sizes, original_sizes,
                 ext_threshold: Optional[float] = None) -> Optional[bytes]:
        """Edge-side inference: returns the wire bytes, or None when the ext
        filter aborts (reference RcnnHead.forward returning None,
        split_rcnn.py:29-33; batch-1 semantics like the reference)."""
        q, scale, zp, ext_logits = head_jit(jnp.asarray(images))
        ext_np = np.asarray(ext_logits)
        if (ext_threshold is not None and self.model.bottleneck.ext is not None
                and images.shape[0] == 1 and ext_np[0, 1] < ext_threshold):
            return None
        packet = WirePacket(np.asarray(q), float(scale), float(zp),
                            np.asarray(image_sizes),
                            np.asarray(original_sizes), ext_np)
        return pack_wire(packet)

    def run_server(self, tail_call, wire: bytes, bucket_hw: Tuple[int, int]):
        """Server-side inference from wire bytes to final detections in
        original-image coordinates."""
        p = unpack_wire(wire)
        dets = tail_call(jnp.asarray(p.tensor), p.scale, p.zero_point,
                         p.image_sizes, bucket_hw)
        dets = {k: np.asarray(v) for k, v in dets.items()}
        scale = p.original_sizes.astype(np.float32) / \
            p.image_sizes.astype(np.float32)
        sy, sx = scale[:, 0][:, None], scale[:, 1][:, None]
        b = dets["boxes"]
        dets["boxes_model"] = b
        dets["boxes"] = np.stack([b[..., 0] * sx, b[..., 1] * sy,
                                  b[..., 2] * sx, b[..., 3] * sy], axis=-1)
        return dets


def split_rcnn_model(model: RCNN, params: Params, state: Params,
                     quantization: Optional[int] = 8):
    """Reference-API analog (split_rcnn.py:215-221): returns
    (head_call, tail_call, split_param_trees)."""
    split = SplitRCNN(model, quantization)
    return split.build(params, state)


_MAGIC_JPEG = b"HGJ1"  # RGB-over-wire format v1


class JpegInputSplit:
    """RGB-over-wire deployment baseline: the edge JPEG-encodes the resized
    frame and the server runs the FULL detector on the decoded pixels.

    This is the input-compression baseline the reference's cost analyzer
    prices bottleneck wires against (analyze_data_size's jpeg_quality
    re-encoded sizes, src/cost_analyzer.py:89-137; dataset-level analog
    coco_util jpeg_quality), made actually runnable.  Useful to A/B wire
    size and mAP against the bottleneck split on the same checkpoints.
    """

    def __init__(self, model: RCNN, quality: int = 95):
        self.model = model
        self.quality = int(quality)

    # ----------------------------------------------------------------- edge
    def run_edge(self, images: np.ndarray, image_sizes,
                 original_sizes) -> bytes:
        """images: [B, H, W, 3] float in [0, 1] (padded bucket).  Each image
        is cropped to its valid size and JPEG-encoded — padding bytes never
        cross the wire."""
        import io

        from PIL import Image

        image_sizes = np.asarray(image_sizes, np.int32)
        blobs = []
        for i in range(images.shape[0]):
            h, w = int(image_sizes[i, 0]), int(image_sizes[i, 1])
            u8 = np.clip(np.asarray(images[i, :h, :w]) * 255.0 + 0.5,
                         0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(u8).save(buf, format="JPEG",
                                     quality=self.quality)
            blobs.append(buf.getvalue())
        meta = {
            "quality": self.quality,
            "lengths": [len(b) for b in blobs],
            "image_sizes": image_sizes.tolist(),
            "original_sizes": np.asarray(original_sizes).tolist(),
        }
        mb = json.dumps(meta).encode()
        return _MAGIC_JPEG + struct.pack("<I", len(mb)) + mb + b"".join(blobs)

    # --------------------------------------------------------------- server
    def build_server(self, params: Params, state: Params):
        model = self.model
        cache: Dict[Tuple[int, int, int], Any] = {}

        def server_call(images, image_sizes, original_sizes):
            key = tuple(images.shape[:3])
            if key not in cache:
                cache[key] = jax.jit(
                    lambda im, sz, osz: model.forward(
                        params, state, {"images": im, "image_sizes": sz,
                                        "original_sizes": osz},
                        training=False,
                        use_bottleneck_transformer=False)[0])
            return cache[key](images, image_sizes, original_sizes)
        return server_call

    def run_server(self, server_call, wire: bytes,
                   bucket_hw: Tuple[int, int]):
        """Decode the JPEG payload, pad back into the bucket, run the full
        detector; boxes are returned in original-image coordinates."""
        from PIL import Image

        if len(wire) < 8:
            raise WireError("jpeg-wire packet truncated before header")
        if wire[:4] != _MAGIC_JPEG:
            raise WireError(f"bad jpeg-wire magic {wire[:4]!r}")
        (mlen,) = struct.unpack("<I", wire[4:8])
        if mlen > _MAX_META_BYTES or len(wire) < 8 + mlen:
            raise WireError("jpeg-wire metadata truncated or oversized")
        try:
            meta = json.loads(wire[8:8 + mlen].decode())
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise WireError("jpeg-wire metadata is not valid JSON") from e
        lengths = meta.get("lengths")
        if (not isinstance(lengths, list)
                or not all(isinstance(n, int) and n >= 0 for n in lengths)):
            raise WireError("jpeg-wire lengths metadata malformed")
        if sum(lengths) != len(wire) - 8 - mlen:
            raise WireError("jpeg-wire body length disagrees with metadata")
        batch = len(lengths)
        image_sizes = _sizes_array(meta, "image_sizes", batch)
        original_sizes = _sizes_array(meta, "original_sizes", batch)
        bh, bw = bucket_hw
        if (image_sizes[:, 0] > bh).any() or (image_sizes[:, 1] > bw).any():
            raise WireError("jpeg-wire image sizes exceed the bucket")
        body = wire[8 + mlen:]
        images = np.zeros((batch, bh, bw, 3), np.float32)
        off = 0
        for i, n in enumerate(meta["lengths"]):
            import io as _io
            u8 = np.asarray(Image.open(_io.BytesIO(body[off:off + n]))
                            .convert("RGB"), np.uint8)
            off += n
            h, w = int(image_sizes[i, 0]), int(image_sizes[i, 1])
            images[i, :h, :w] = u8.astype(np.float32) / 255.0
        dets = server_call(jnp.asarray(images), jnp.asarray(image_sizes),
                           jnp.asarray(original_sizes))
        return {k: np.asarray(v) for k, v in dets.items()}
