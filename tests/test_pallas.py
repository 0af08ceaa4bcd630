"""Pallas kernels in interpreter mode vs the jnp/numpy references."""
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.codec.quantizer import quantize_tensor, dequantize_tensor
from hnd_ghnd_tpu.ops.pallas_quant import pallas_quantize, pallas_dequantize

from tests import oracles


class TestPallasQuantizer:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bit_exact_vs_reference_formula(self, seed):
        rng = np.random.RandomState(seed)
        x = (rng.randn(1, 24, 36, 3) * 3).astype(np.float32)
        q = pallas_quantize(jnp.asarray(x), 8, interpret=True)
        want_q, want_scale, want_zp = oracles.quantize_tensor(x, 8)
        np.testing.assert_array_equal(np.asarray(q.tensor), want_q)
        assert float(q.scale) == pytest.approx(float(want_scale), rel=1e-6)
        assert float(q.zero_point) == want_zp

    def test_matches_jnp_codec(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray((rng.randn(2, 8, 8, 4) * 5).astype(np.float32))
        qp = pallas_quantize(x, 8, interpret=True)
        qj = quantize_tensor(x, 8)
        np.testing.assert_array_equal(np.asarray(qp.tensor),
                                      np.asarray(qj.tensor))
        dp = pallas_dequantize(qp, interpret=True)
        dj = dequantize_tensor(qj)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dj),
                                   rtol=1e-6, atol=1e-6)

    def test_large_tensor_near_exact(self):
        # gridded path (multiple VMEM chunks); TPU division 1-ulp caveat
        # means <= ~1e-6 of elements may sit one level off at .5 boundaries
        rng = np.random.RandomState(7)
        x = (rng.randn(2, 520, 1024, 3) * 4).astype(np.float32)
        q = pallas_quantize(jnp.asarray(x), 8, interpret=True)
        want_q, want_scale, _ = oracles.quantize_tensor(x, 8)
        diff = np.abs(np.asarray(q.tensor).astype(int) - want_q.astype(int))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 1e-5
        assert float(q.scale) == pytest.approx(float(want_scale), rel=1e-6)

    def test_roundtrip_error_bounded_by_scale(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(-2, 2, (1, 16, 16, 3)).astype(np.float32))
        q = pallas_quantize(x, 8, interpret=True)
        rec = pallas_dequantize(q, interpret=True)
        err = np.abs(np.asarray(rec) - np.asarray(x)).max()
        assert err <= float(q.scale) * 0.5 + 1e-6
