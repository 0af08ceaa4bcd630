"""ResNet trunk with injectable stages (the "custom" ResNet of the reference).

Capability parity (reference: src/models/custom/resnet.py — a torchvision
ResNet clone whose layer1..layer4 can each be replaced by an injected module
at construction; only layer1 injection is ever exercised, with the
compressive bottleneck).  The trunk uses frozen BatchNorm throughout
(reference: src/models/org/rcnn.py:388-396 passes FrozenBatchNorm2d), which
here is a folded scale/bias — a pure VPU multiply-add that XLA fuses into the
adjacent convolutions.

Depth variants cover the reference zoo surface (resnet18/34/50/101/152,
resnext50_32x4d/101_32x8d, wide_resnet50_2/101_2 — src/models/custom/
resnet.py:117-218) via the same (block, layers, groups, width) parameter
space; resnet50 is the only one with published detector weights.

Structure is functional: ``init(rng)`` builds a nested param dict whose keys
('conv1', 'bn1', 'layer1'.'0'.'conv2', ...) mirror torch module paths for
checkpoint conversion and YAML ``frozen_modules`` addressing.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.models import layers as L

Params = Dict[str, Any]

# name -> (block_type, layer_counts, groups, width_per_group)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 1, 128),
}

_EXPANSION = {"basic": 1, "bottleneck": 4}


def _use_pallas_stem() -> bool:
    """Opt-in experimental Pallas stem (ops/pallas_stem.py).

    Disabled by default: on the current v5e backend the fused kernel
    measures 21.7 ms vs XLA's 11.1 ms for the batch-24 stem because Mosaic
    lowers the 16-channel space-to-depth slabs at 16/128-lane VPU
    efficiency (see ROADMAP.md "stem conv" analysis).  Kept wired so newer
    Mosaic releases can be re-evaluated with HND_TPU_PALLAS_STEM=1.
    """
    import os
    return os.environ.get("HND_TPU_PALLAS_STEM", "0") == "1"


def _grouped_conv(params, x, stride, padding, groups):
    if groups == 1:
        return L.conv2d(params, x, stride=stride, padding=padding)
    w = params["w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out


class ResNetBody:
    """The convolutional trunk: stem + layer1..layer4, NHWC.

    ``injected_layer1`` (a Bottleneck4LargeResNet) replaces layer1 when set;
    its apply contract is (params, state, x, **mode flags) ->
    (y, new_state, ext_logits).
    """

    def __init__(self, name: str = "resnet50", injected_layer1=None):
        if name.startswith("custom_"):
            name = name[len("custom_"):]
        if name not in RESNET_SPECS:
            raise ValueError(f"unknown resnet variant `{name}`")
        self.name = name
        block, counts, groups, width = RESNET_SPECS[name]
        self.block = block
        self.counts = counts
        self.groups = groups
        self.base_width = width
        self.expansion = _EXPANSION[block]
        self.injected_layer1 = injected_layer1
        # out channels per stage
        self.stage_planes = [64, 128, 256, 512]
        self.out_channels = [p * self.expansion for p in self.stage_planes]
        self.inplanes = 64 * self.expansion * 8 // 8  # final inplanes = 512*exp

    # ------------------------------------------------------------------ init
    def _init_block(self, rng, inplanes: int, planes: int, stride: int,
                    has_downsample: bool) -> Params:
        keys = jax.random.split(rng, 4)
        width = int(planes * self.base_width / 64.0) * self.groups
        p: Params = {}
        # The branch-final frozen BN is zero-initialized so every residual
        # block starts as identity: with folded (identity) frozen BN there is
        # no normalization at random init, and variance would otherwise
        # double through each of the 16 blocks (~2^16x by layer4).  Converted
        # checkpoints overwrite these scales with real folded statistics.
        def zero_bn(ch):
            bn = L.frozen_bn_init(ch)
            return {"scale": bn["scale"] * 0.0, "bias": bn["bias"]}

        if self.block == "bottleneck":
            p["conv1"] = L.conv_init(keys[0], 1, 1, inplanes, width)
            p["bn1"] = L.frozen_bn_init(width)
            p["conv2"] = L.conv_init(keys[1], 3, 3, width // self.groups, width)
            p["bn2"] = L.frozen_bn_init(width)
            p["conv3"] = L.conv_init(keys[2], 1, 1, width, planes * 4)
            p["bn3"] = zero_bn(planes * 4)
            out_ch = planes * 4
        else:
            p["conv1"] = L.conv_init(keys[0], 3, 3, inplanes, planes)
            p["bn1"] = L.frozen_bn_init(planes)
            p["conv2"] = L.conv_init(keys[1], 3, 3, planes, planes)
            p["bn2"] = zero_bn(planes)
            out_ch = planes
        if has_downsample:
            p["downsample"] = {
                "0": L.conv_init(keys[3], 1, 1, inplanes, out_ch),
                "1": L.frozen_bn_init(out_ch),
            }
        return p

    def init(self, rng) -> Tuple[Params, Params]:
        keys = jax.random.split(rng, 6)
        params: Params = {
            "conv1": L.conv_init(keys[0], 7, 7, 3, 64),
            "bn1": L.frozen_bn_init(64),
        }
        state: Params = {}
        inplanes = 64
        for stage, (count, planes) in enumerate(zip(self.counts, self.stage_planes)):
            lname = f"layer{stage + 1}"
            if stage == 0 and self.injected_layer1 is not None:
                lp, ls = self.injected_layer1.init(keys[1])
                params[lname] = lp
                state[lname] = ls
                inplanes = 64 * self.expansion
                continue
            stride = 1 if stage == 0 else 2
            blocks: Params = {}
            bkeys = jax.random.split(keys[stage + 1], count)
            for b in range(count):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * self.expansion)
                blocks[str(b)] = self._init_block(bkeys[b], inplanes, planes, s, has_ds)
                inplanes = planes * self.expansion
            params[lname] = blocks
        return params, state

    # --------------------------------------------------------------- forward
    def _apply_block(self, p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
        identity = x
        if self.block == "bottleneck":
            out = L.relu(L.frozen_bn(p["bn1"], L.conv2d(p["conv1"], x)))
            out = _grouped_conv(p["conv2"], out, stride, 1, self.groups)
            out = L.relu(L.frozen_bn(p["bn2"], out))
            out = L.frozen_bn(p["bn3"], L.conv2d(p["conv3"], out))
        else:
            out = L.conv2d(p["conv1"], x, stride=stride, padding=1)
            out = L.relu(L.frozen_bn(p["bn1"], out))
            out = L.frozen_bn(p["bn2"], L.conv2d(p["conv2"], out, padding=1))
        if "downsample" in p:
            identity = L.frozen_bn(p["downsample"]["1"],
                                   L.conv2d(p["downsample"]["0"], x, stride=stride))
        return L.relu(out + identity)

    def stem(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if _use_pallas_stem():
            from hnd_ghnd_tpu.ops import pallas_stem as PS
            if PS.stem_supported(x):
                y = PS.stem_conv_bn_relu(
                    x, params["conv1"]["w"],
                    params["bn1"]["scale"], params["bn1"]["bias"],
                    jax.default_backend() != "tpu")  # interpret off-TPU
                return L.max_pool(y, 3, 2, 1)
        y = L.conv2d(params["conv1"], x, stride=2, padding=3)
        y = L.relu(L.frozen_bn(params["bn1"], y))
        return L.max_pool(y, 3, 2, 1)

    def _apply_stage(self, params: Params, x: jnp.ndarray, stage: int) -> jnp.ndarray:
        blocks = params[f"layer{stage + 1}"]
        stride = 1 if stage == 0 else 2
        for b in range(self.counts[stage]):
            x = self._apply_block(blocks[str(b)], x, stride if b == 0 else 1)
        return x

    def apply(self, params: Params, state: Params, x: jnp.ndarray, *,
              training: bool = False, use_bottleneck_transformer: bool = False,
              ext_training: bool = False, upto: int = 4):
        """Full trunk forward.

        Returns (features dict {'layer1'..'layer4'}, new_state, ext_logits).
        With an injected bottleneck, state carries its BN statistics.

        ``upto`` truncates the trunk after ``layer{upto}`` — the HND
        distillation step only needs layer1, so layers 2-4 (and the FPN) can
        be skipped entirely; the reference computes them wastefully.
        """
        new_state: Params = dict(state)
        ext_logits = None
        y = self.stem(params, x)
        feats: Dict[str, jnp.ndarray] = {}
        if self.injected_layer1 is not None:
            y, l1_state, ext_logits = self.injected_layer1.apply(
                params["layer1"], state["layer1"], y, training=training,
                use_bottleneck_transformer=use_bottleneck_transformer,
                ext_training=ext_training)
            new_state["layer1"] = l1_state
            if ext_training:
                return {}, new_state, ext_logits
        else:
            y = self._apply_stage(params, y, 0)
        feats["layer1"] = y
        for stage in (1, 2, 3):
            if stage + 1 > upto:
                break
            y = self._apply_stage(params, y, stage)
            feats[f"layer{stage + 1}"] = y
        return feats, new_state, ext_logits
