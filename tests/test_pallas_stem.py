"""Pallas fused stem (conv7x7/s2 + frozen BN + ReLU) vs the XLA oracle.

Runs the kernel in interpreter mode on CPU; the same program compiles for
TPU unchanged.  Oracle = ops.pallas_stem.stem_reference (plain XLA conv),
itself pinned against torch in tests/test_torch_parity.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.ops.pallas_stem import (stem_conv_bn_relu, stem_reference,
                                          stem_supported)


def _inputs(h, w, b=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    return x, w7, scale, bias


class TestForward:
    @pytest.mark.parametrize("h,w", [(64, 64), (96, 128), (62, 100)])
    def test_matches_xla_fp32(self, h, w):
        x, w7, scale, bias = _inputs(h, w)
        assert stem_supported(x)
        got = stem_conv_bn_relu(x, w7, scale, bias, True)
        want = stem_reference(x, w7, scale, bias)
        assert got.shape == want.shape == (2, h // 2, w // 2, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    def test_row_padding_does_not_leak(self):
        # H/2 = 33 not divisible by the row tile: padded rows must not
        # corrupt the last real rows.
        x, w7, scale, bias = _inputs(66, 64)
        got = stem_conv_bn_relu(x, w7, scale, bias, True)
        want = stem_reference(x, w7, scale, bias)
        np.testing.assert_allclose(np.asarray(got[:, -1]),
                                   np.asarray(want[:, -1]),
                                   rtol=1e-5, atol=1e-4)

    def test_bf16(self):
        x, w7, scale, bias = _inputs(64, 64)
        xb = x.astype(jnp.bfloat16)
        got = stem_conv_bn_relu(xb, w7.astype(jnp.bfloat16), scale, bias,
                                True)
        assert got.dtype == jnp.bfloat16
        want = stem_reference(xb, w7.astype(jnp.bfloat16), scale, bias)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.1)

    def test_unsupported_shapes_flagged(self):
        assert not stem_supported(jnp.zeros((1, 63, 64, 3)))   # odd H
        assert not stem_supported(jnp.zeros((1, 64, 64, 4)))   # 4 channels
        assert not stem_supported(jnp.zeros((1, 8, 64, 3)))    # too short


class TestBackward:
    def test_grads_match_xla(self):
        x, w7, scale, bias = _inputs(64, 96)

        def loss_pallas(x, w7, s, b):
            y = stem_conv_bn_relu(x, w7, s, b, True)
            return jnp.sum(y * y * 0.5)

        def loss_ref(x, w7, s, b):
            y = stem_reference(x, w7, s, b)
            return jnp.sum(y * y * 0.5)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w7, scale, bias)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w7, scale, bias)
        names = ["dx", "dw7", "dscale", "dbias"]
        for n, g, w in zip(names, got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-3,
                err_msg=n)

    def test_grads_with_row_padding(self):
        x, w7, scale, bias = _inputs(66, 64)  # OH=33, padded grid

        f = lambda w: jnp.sum(stem_conv_bn_relu(x, w, scale, bias, True))
        r = lambda w: jnp.sum(stem_reference(x, w, scale, bias))
        np.testing.assert_allclose(np.asarray(jax.grad(f)(w7)),
                                   np.asarray(jax.grad(r)(w7)),
                                   rtol=1e-4, atol=1e-3)


class TestModelWiring:
    def test_resnet_stem_dispatches_under_flag(self, monkeypatch):
        import jax
        from hnd_ghnd_tpu.models.resnet import ResNetBody

        body = ResNetBody("resnet50")
        params, _ = body.init(jax.random.PRNGKey(0))
        x, _, _, _ = _inputs(64, 64)

        base = body.stem(params, x)
        monkeypatch.setenv("HND_TPU_PALLAS_STEM", "1")
        flagged = body.stem(params, x)
        np.testing.assert_allclose(np.asarray(flagged), np.asarray(base),
                                   rtol=1e-5, atol=1e-4)
