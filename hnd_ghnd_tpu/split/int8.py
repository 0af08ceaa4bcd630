"""int8 end-to-end server-tail inference (post-training quantization).

Beyond-reference TPU deployment feature (the reference's only quantization
is the 8-bit *wire* codec, src/structure/transformer.py:131-153): here the
server tail's trunk — bottleneck decoder + ResNet layers2-4, ~90% of tail
FLOPs — runs with int8 weights AND int8 activations, so the MXU consumes
s8 x s8 -> s32 (2x bf16 peak on v5e) and HBM traffic for trunk activations
drops 4x vs fp32.

Scheme (standard post-training static quantization):
  * weights: symmetric per-output-channel int8, with the adjacent
    normalization (frozen BN in the trunk, running-stats BN in the decoder)
    folded into the weights *before* quantization so the quantizer sees the
    effective kernel scale;
  * activations: per-tensor int8 with calibration-derived scales (max-abs
    over calibration batches at every requantization site).  Post-ReLU
    sites (every site except the two mid-decoder linear ones) are
    NONNEGATIVE, so they quantize asymmetrically with zero point -128:
    stored q = round(x * 255/amax) - 128 uses the full int8 range (half
    the quantization step of a symmetric scheme).  The conv consuming a
    zero-point input needs sum-of-weights corrections: a per-channel bias
    fold for pad=0 convs, and for padded convs a border-exact correction
    map from a 1-input-channel ones-conv (cost 1/Cin of the main conv);
  * convolutions accumulate in int32 (``preferred_element_type``);
    elementwise stages (bias add, residual add, ReLU, requantize) run in
    fp32 on the VPU — the inter-layer tensors are int8 end to end;
  * the incoming wire is already integer (the affine uint8 bottleneck
    codec), so wire + weights + activations are all integer on the trunk.
    FPN/RPN/RoI heads stay in floating point (accuracy-critical, ~10% of
    tail FLOPs).

The calibration walk and the quantized walk share one structural traversal
(`_trunk_walk`) parameterized by an ops kit, so the calibration sites are
aligned with the quantized requantization points by construction.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnd_ghnd_tpu.codec.quantizer import QuantizedTensor, dequantize_tensor
from hnd_ghnd_tpu.split.deploy import SplitRCNN, _split_tail_params

Params = Dict[str, Any]

_BN_EPS = 1e-5  # decoder BatchNorm eps (models/layers.batch_norm default)


# ---------------------------------------------------------------------------
# BN folding: produce per-conv effective (w, b) so quantization sees the
# true kernel scales
# ---------------------------------------------------------------------------

def _fold_conv_bn(conv_p: Params, scale: jnp.ndarray,
                  bias: jnp.ndarray, relu: bool,
                  groups: int = 1) -> Params:
    """y = bn(conv(x)) = conv(x; w*scale) + (scale*conv_b + bias)."""
    w = jnp.asarray(conv_p["w"], jnp.float32) * scale[None, None, None, :]
    b = jnp.asarray(bias, jnp.float32)
    if "b" in conv_p:
        b = b + scale * jnp.asarray(conv_p["b"], jnp.float32)
    return {"w": w, "b": b, "relu": relu, "groups": groups}


def _frozen_bn_affine(bn_p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (jnp.asarray(bn_p["scale"], jnp.float32),
            jnp.asarray(bn_p["bias"], jnp.float32))


def _batch_norm_affine(bn_p: Params, bn_s: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode trainable BN folded to (scale, bias) from running stats."""
    inv = jnp.asarray(bn_p["gamma"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_s["var"], jnp.float32) + _BN_EPS)
    return inv, (jnp.asarray(bn_p["beta"], jnp.float32)
                 - jnp.asarray(bn_s["mean"], jnp.float32) * inv)


def fold_tail(model, params: Params, state: Params) -> Params:
    """Fold the tail trunk (decoder + layers2-4) into per-conv effective
    weights.  Returns {"dec_in": (scale, bias), "dec": [convs],
    "stages": [[blocks]]}."""
    assert model.body.block == "bottleneck", \
        "int8 tail supports bottleneck-block ResNets (the detector zoo)"
    tail_params = _split_tail_params(params)
    body_p = tail_params["backbone"]["body"]
    dec_p = body_p["layer1"]["decoder"]
    dec_s = state["backbone"]["body"]["layer1"]["decoder"]

    out: Params = {"dec_in": _batch_norm_affine(dec_p["bn_in"],
                                                dec_s["bn_in"])}
    # decoder: conv{i} + bn{i}, ReLU after 1 and 3
    # (models/bottleneck.py _DEC_RELU_AFTER)
    out["dec"] = [
        _fold_conv_bn(dec_p[f"conv{i}"],
                      *_batch_norm_affine(dec_p[f"bn{i}"], dec_s[f"bn{i}"]),
                      relu=i in (1, 3))
        for i in range(4)
    ]
    groups = model.body.groups
    stages: List[List[Params]] = []
    for stage in (1, 2, 3):
        blocks_p = body_p[f"layer{stage + 1}"]
        blocks: List[Params] = []
        for b in range(model.body.counts[stage]):
            p = blocks_p[str(b)]
            blk = {
                "conv1": _fold_conv_bn(p["conv1"],
                                       *_frozen_bn_affine(p["bn1"]),
                                       relu=True),
                "conv2": _fold_conv_bn(p["conv2"],
                                       *_frozen_bn_affine(p["bn2"]),
                                       relu=True, groups=groups),
                "conv3": _fold_conv_bn(p["conv3"],
                                       *_frozen_bn_affine(p["bn3"]),
                                       relu=False),
            }
            if "downsample" in p:
                blk["downsample"] = _fold_conv_bn(
                    p["downsample"]["0"],
                    *_frozen_bn_affine(p["downsample"]["1"]), relu=False)
            blocks.append(blk)
        stages.append(blocks)
    out["stages"] = stages
    return out


def quantize_folded(folded: Params) -> Params:
    """Symmetric per-output-channel int8 weight quantization of a folded
    tail: each conv entry gains qw (int8 HWIO) and sw ([cout] fp32)."""
    def quant_conv(fw: Params) -> Params:
        amax = jnp.max(jnp.abs(fw["w"]), axis=(0, 1, 2))
        sw = jnp.where(amax > 0, amax / 127.0, 1.0)
        qw = jnp.clip(jnp.round(fw["w"] / sw), -127, 127).astype(jnp.int8)
        return dict(fw, qw=qw, sw=sw)

    out = {"dec_in": folded["dec_in"],
           "dec": [quant_conv(fw) for fw in folded["dec"]],
           "stages": [[{k: (quant_conv(v) if isinstance(v, dict) else v)
                        for k, v in blk.items()}
                       for blk in blocks]
                      for blocks in folded["stages"]]}
    return out


# ---------------------------------------------------------------------------
# The shared trunk traversal, parameterized by an ops kit
# ---------------------------------------------------------------------------

def _conv_fp(x, fw, stride, pad, groups):
    out = jax.lax.conv_general_dilated(
        x, fw["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return out + fw["b"].astype(out.dtype)


class _CalibKit:
    """fp32 walk recording max-abs at every requantization site."""

    def __init__(self):
        self.amax: Dict[str, jnp.ndarray] = {}

    def site(self, name, x, unsigned=False):
        self.amax[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
        return x

    def conv(self, name, x, fw, stride=1, pad=0, relu=False):
        y = _conv_fp(x, fw, stride, pad, fw.get("groups", 1))
        if relu:
            y = jnp.maximum(y, 0)
        return self.site(name, y)

    def conv_fp_out(self, x, fw, stride=1, pad=0):
        return _conv_fp(x, fw, stride, pad, fw.get("groups", 1))

    def to_fp(self, x):
        return x


class _QuantKit:
    """int8 walk: activations are (q_int8, scale, zero_point) triples
    between sites; value = (q + zp) * scale with zp in {0, 128}."""

    def __init__(self, act_scales: Dict[str, float]):
        self.act_scales = act_scales

    def site(self, name, x_fp, unsigned=False):
        # act_scales keep the amax/127 convention (serialized contract);
        # the unsigned range [0, 255] derives its finer step from it
        s = jnp.float32(self.act_scales[name])
        if unsigned:
            su = s * jnp.float32(127.0 / 255.0)  # = amax / 255
            q = (jnp.clip(jnp.round(x_fp / su), 0, 255) - 128
                 ).astype(jnp.int8)
            return (q, su, 128)
        q = jnp.clip(jnp.round(x_fp / s), -127, 127).astype(jnp.int8)
        return (q, s, 0)

    def _acc(self, xq, fw, stride, pad):
        q, s_in, zp = xq
        acc = jax.lax.conv_general_dilated(
            q, fw["qw"],
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fw.get("groups", 1),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        if zp:
            # true x = (q + zp) * s: the conv needs zp * sum-of-weights
            # over IN-IMAGE taps (lax zero-padding already contributes 0,
            # which is the true padding value, so pads must NOT be counted)
            wsum = fw["qw"].astype(jnp.float32).sum(axis=2)  # [kh, kw, C]
            if pad == 0:
                acc = acc + zp * wsum.sum(axis=(0, 1))  # constant [C]
            else:
                ones = jnp.ones(q.shape[:3] + (1,), jnp.float32)
                m = jax.lax.conv_general_dilated(
                    ones, wsum[:, :, None, :],
                    window_strides=(stride, stride),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                acc = acc + zp * m
        return acc * (s_in * fw["sw"]) + fw["b"]

    def conv(self, name, xq, fw, stride=1, pad=0, relu=False):
        y = self._acc(xq, fw, stride, pad)
        if relu:
            y = jnp.maximum(y, 0)
        return self.site(name, y, unsigned=relu)

    def conv_fp_out(self, xq, fw, stride=1, pad=0):
        return self._acc(xq, fw, stride, pad)

    def to_fp(self, xq):
        q, s, zp = xq
        return (q.astype(jnp.float32) + zp) * s


def _trunk_walk(kit, z_fp: jnp.ndarray, folded: Params,
                counts: Sequence[int]) -> List[jnp.ndarray]:
    """decoder -> layers2-4; returns fp feature list [layer1..layer4]."""
    inv, shift = folded["dec_in"]
    x = kit.site("dec_in", jnp.maximum(z_fp.astype(jnp.float32) * inv + shift,
                                       0), unsigned=True)
    for i, fw in enumerate(folded["dec"]):
        # decoder convs: kernel 2, stride 1, no padding
        x = kit.conv(f"dec{i}", x, fw, stride=1, pad=0, relu=fw["relu"])
    feats = [kit.to_fp(x)]
    for s_i, blocks in enumerate(folded["stages"]):
        for b_i, blk in enumerate(blocks):
            stride = 2 if b_i == 0 else 1
            name = f"s{s_i}b{b_i}"
            identity = x
            y = kit.conv(name + "c1", x, blk["conv1"], relu=True)
            y = kit.conv(name + "c2", y, blk["conv2"], stride=stride, pad=1,
                         relu=True)
            y3 = kit.conv_fp_out(y, blk["conv3"])
            if "downsample" in blk:
                id_fp = kit.conv_fp_out(identity, blk["downsample"],
                                        stride=stride)
            else:
                id_fp = kit.to_fp(identity)
            x = kit.site(name + "out", jnp.maximum(y3 + id_fp, 0),
                         unsigned=True)
        feats.append(kit.to_fp(x))
    return feats


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

def calibrate_tail(model, params: Params, state: Params,
                   z_batches: Sequence[np.ndarray]) -> Dict[str, float]:
    """Run the fp folded walk over calibration bottleneck tensors and
    return per-site activation scales (max-abs / 127).

    ``z_batches``: dequantized wire tensors [B, H', W', bch] — calibrate on
    what the tail will actually see (post wire round-trip)."""
    folded = fold_tail(model, params, state)

    @jax.jit
    def amax_of(z):
        kit = _CalibKit()
        _trunk_walk(kit, z, folded, model.body.counts)
        return kit.amax

    amax: Dict[str, float] = {}
    for z in z_batches:
        a = jax.device_get(amax_of(jnp.asarray(z, jnp.float32)))
        for k, v in a.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in amax.items()}


def calibrate_from_images(model, params: Params, state: Params,
                          image_batches: Sequence[np.ndarray],
                          quant_bits: int = 8) -> Dict[str, float]:
    """Convenience: edge head (incl. the wire codec round-trip) on
    calibration images -> dequantized wire tensors -> calibrate_tail."""
    split = SplitRCNN(model, quant_bits)
    head_jit, _, _ = split.build(params, state)
    zs = []
    for images in image_batches:
        q, scale, zp, _ = head_jit(jnp.asarray(images))
        zs.append(np.asarray(dequantize_tensor(
            QuantizedTensor(q, scale, zp))))
    return calibrate_tail(model, params, state, zs)


# ---------------------------------------------------------------------------
# The deployable int8 tail
# ---------------------------------------------------------------------------

class Int8SplitTail:
    """Server tail with an integer trunk; drop-in for SplitRCNN's tail_call
    (same wire in, same detection dict out)."""

    def __init__(self, model, params: Params, state: Params,
                 act_scales: Dict[str, float]):
        assert model.bottleneck is not None, "requires a bottleneck model"
        self.model = model
        self.tail_params = _split_tail_params(params)
        self.qfolded = quantize_folded(fold_tail(model, params, state))
        self.act_scales = dict(act_scales)

    def tail_fn(self, q_tensor, scale, zero_point, image_sizes,
                bucket_hw: Tuple[int, int]):
        model = self.model
        z = dequantize_tensor(QuantizedTensor(q_tensor, scale, zero_point))
        kit = _QuantKit(self.act_scales)
        feats = _trunk_walk(kit, z, self.qfolded, model.body.counts)
        fpn_feats = model.fpn.apply(self.tail_params["backbone"]["fpn"],
                                    feats)
        proposals, prop_valid, _ = model.rpn.propose(
            self.tail_params["rpn"], fpn_feats, image_sizes, bucket_hw,
            training=False)
        return model.roi_heads.infer(
            self.tail_params["roi_heads"], fpn_feats, proposals, prop_valid,
            image_sizes, bucket_hw)

    def build(self):
        """Returns tail_call(q, scale, zp, image_sizes, bucket_hw) with a
        per-bucket jit cache (mirrors SplitRCNN.build's tail_call)."""
        cache: Dict[Tuple[int, int], Any] = {}

        def tail_call(q_tensor, scale, zero_point, image_sizes, bucket_hw):
            key = tuple(bucket_hw)
            if key not in cache:
                cache[key] = jax.jit(
                    lambda q, s, zp, sz: self.tail_fn(q, s, zp, sz, key))
            return cache[key](q_tensor, jnp.float32(scale),
                              jnp.float32(zero_point),
                              jnp.asarray(image_sizes))
        return tail_call


def trunk_features_fp(model, params: Params, state: Params,
                      z_fp: jnp.ndarray) -> List[jnp.ndarray]:
    """fp folded-walk features (testing/debug reference for the int8 walk:
    must equal the model's own eval-mode decode + layers2-4)."""
    folded = fold_tail(model, params, state)
    kit = _CalibKit()
    return _trunk_walk(kit, jnp.asarray(z_fp, jnp.float32), folded,
                       model.body.counts)


def trunk_features_int8(model, params: Params, state: Params,
                        z_fp: jnp.ndarray,
                        act_scales: Dict[str, float]) -> List[jnp.ndarray]:
    """int8 walk features (dequantized at stage boundaries)."""
    qfolded = quantize_folded(fold_tail(model, params, state))
    kit = _QuantKit(act_scales)
    return _trunk_walk(kit, jnp.asarray(z_fp, jnp.float32), qfolded,
                       model.body.counts)
