"""Functional NN primitives (NHWC, param pytrees) for the detector stack.

No module framework: every layer is a pure function ``apply(params, x)`` plus
an ``init(rng, ...) -> params`` constructor.  Parameters are nested dicts so a
whole model's pytree mirrors the reference's module paths — which is what lets
the reference YAML schema (``ts_modules: ['backbone.body.layer1', ...]``,
``frozen_modules: [...]``) address our parameters unchanged.

Conventions:
  * activations NHWC, conv kernels HWIO (JAX native TPU layouts);
  * convolutions run in the requested compute dtype; the TPU MXU accumulates
    bf16 operands in fp32 internally, so bf16 speed never costs fp32
    accumulation accuracy;
  * BatchNorm comes in two flavors exactly like the reference: ``frozen_bn``
    (inference affine fold — torchvision FrozenBatchNorm2d, used across the
    ResNet trunk) and ``batch_norm`` (trainable with running stats, used
    inside the injected bottleneck, reference src/models/mimic/resnet_layer.py).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so randomly-initialized parity tests are
# distribution-comparable; exact values load from converted checkpoints).
# ---------------------------------------------------------------------------

def _kaiming_uniform(rng, shape, fan_in, a=math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def conv_init(rng, kh, kw, cin, cout, use_bias=False, mode="fan_out_normal") -> Params:
    """Conv param init. torchvision ResNet uses kaiming_normal(fan_out);
    plain torch Conv2d default is kaiming_uniform(a=sqrt(5))."""
    wkey, bkey = jax.random.split(rng)
    fan_in = kh * kw * cin
    if mode == "fan_out_normal":
        fan_out = kh * kw * cout
        std = math.sqrt(2.0 / fan_out)
        w = jax.random.normal(wkey, (kh, kw, cin, cout), jnp.float32) * std
    else:
        w = _kaiming_uniform(wkey, (kh, kw, cin, cout), fan_in)
    p = {"w": w}
    if use_bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def conv2d(params: Params, x: jnp.ndarray, stride: int | Tuple[int, int] = 1,
           padding: int | Tuple[int, int] | str = 0,
           dilation: int = 1) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC, fp32 accumulation on the MXU."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    w = params["w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def conv_transpose2d(params: Params, x: jnp.ndarray, stride: int = 2,
                     padding: int = 0) -> jnp.ndarray:
    """Transposed conv with torch ConvTranspose2d geometry:
    out = (in - 1) * stride - 2 * padding + kernel."""
    w = params["w"].astype(x.dtype)  # HWIO with I = in channels
    kh, kw = w.shape[0], w.shape[1]
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, jnp.rot90(w, 2, axes=(0, 1)),
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def linear_init(rng, cin, cout) -> Params:
    wkey, bkey = jax.random.split(rng)
    w = _kaiming_uniform(wkey, (cin, cout), cin)
    bound = 1.0 / math.sqrt(cin)
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.dot(x, params["w"].astype(x.dtype))
    return out + params["b"].astype(out.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def frozen_bn_init(channels: int) -> Params:
    """FrozenBatchNorm folded to per-channel scale/bias (identity init)."""
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def frozen_bn(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return (x * params["scale"].astype(x.dtype)
            + params["bias"].astype(x.dtype))


def fold_bn_stats(weight, bias, running_mean, running_var, eps=0.0):
    """Fold torch FrozenBatchNorm2d buffers into (scale, bias).

    torchvision 0.4.2's FrozenBatchNorm2d uses eps=0 in forward:
    scale = w / sqrt(var), bias = b - mean * scale.
    """
    scale = weight / np.sqrt(running_var + eps)
    return {"scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(bias - running_mean * scale, jnp.float32)}


def batch_norm_init(channels: int) -> Tuple[Params, Params]:
    """Trainable BN: (params {gamma, beta}, state {mean, var})."""
    params = {"gamma": jnp.ones((channels,), jnp.float32),
              "beta": jnp.zeros((channels,), jnp.float32)}
    state = {"mean": jnp.zeros((channels,), jnp.float32),
             "var": jnp.ones((channels,), jnp.float32)}
    return params, state


def batch_norm(params: Params, state: Params, x: jnp.ndarray, *,
               training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm2d over NHWC. Returns (y, new_state).

    Training uses batch statistics (biased var for normalization, unbiased
    for the running update — torch semantics); eval uses running stats.
    """
    gamma = params["gamma"].astype(jnp.float32)
    beta = params["beta"].astype(jnp.float32)
    if training:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * gamma
    y = (x.astype(jnp.float32) - mean) * inv + beta
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Pooling / misc
# ---------------------------------------------------------------------------

def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    # -inf init is required for JAX to recognize the differentiable
    # reduce-window-max monoid (finfo.min breaks reverse-mode autodiff)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def adaptive_avg_pool_matrices(in_size: int, out_size: int) -> np.ndarray:
    """Pooling matrix P [in, out] with torch AdaptiveAvgPool2d bin edges:
    bin i averages input[floor(i*in/out) : ceil((i+1)*in/out)].

    Expressing adaptive pooling as two small matmuls (H then W) keeps it on
    the MXU instead of a ragged windowed reduce.
    """
    p = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        p[lo:hi, i] = 1.0 / (hi - lo)
    return p


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """AdaptiveAvgPool2d over NHWC via two matmuls."""
    ph = jnp.asarray(adaptive_avg_pool_matrices(x.shape[1], out_hw[0]), x.dtype)
    pw = jnp.asarray(adaptive_avg_pool_matrices(x.shape[2], out_hw[1]), x.dtype)
    y = jnp.einsum("nhwc,hH->nHwc", x, ph, preferred_element_type=jnp.float32)
    y = jnp.einsum("nHwc,wW->nHWc", y.astype(x.dtype), pw,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)
