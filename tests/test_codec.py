import numpy as np
import jax.numpy as jnp
import pytest

from hnd_ghnd_tpu.codec.quantizer import (Compose, Dequantizer, Quantizer,
                                          dequantize_tensor,
                                          get_bottleneck_transformer,
                                          quantize_tensor)
from hnd_ghnd_tpu.codec.jpeg import JpegCompressor, JpegDecompressor
from hnd_ghnd_tpu.codec.datalogger import DataLogger

from tests import oracles


class TestQuantizer:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bit_exact_vs_oracle(self, seed):
        rng = np.random.RandomState(seed)
        x = (rng.randn(1, 12, 16, 3) * 4).astype(np.float32)
        q = quantize_tensor(jnp.asarray(x), 8)
        want_q, want_scale, want_zp = oracles.quantize_tensor(x, 8)
        np.testing.assert_array_equal(np.asarray(q.tensor), want_q)
        assert float(q.zero_point) == want_zp
        rec = dequantize_tensor(q)
        want_rec = oracles.dequantize_tensor(want_q, want_scale, want_zp)
        np.testing.assert_allclose(np.asarray(rec), want_rec, rtol=1e-6)

    def test_16bit_is_fp16_cast(self):
        x = jnp.asarray([[1.5, -2.25]], jnp.float32)
        q, _ = Quantizer(16)(x)
        assert q.dtype == jnp.float16
        z, _ = Dequantizer(16)(q)
        assert z.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(z), np.asarray(x))

    def test_compose_from_reference_config(self):
        cfg = {"order": ["quantizer", "dequantizer"],
               "components": {"quantizer": {"params": {"num_bits": 8}},
                              "dequantizer": {"params": {"num_bits": 8}}}}
        chain = get_bottleneck_transformer(cfg)
        assert isinstance(chain, Compose)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 4).astype(np.float32))
        z, _ = chain(x)
        assert np.abs(np.asarray(z) - np.asarray(x)).max() < 0.1

    def test_jpeg_components_rejected_in_model_transformer(self):
        cfg = {"order": ["jpeg_compressor"],
               "components": {"jpeg_compressor": {"params": {}}}}
        with pytest.raises(KeyError):
            get_bottleneck_transformer(cfg)


class TestJpegCodec:
    def test_rgb_roundtrip(self):
        # smooth gradient image: JPEG handles it well (noise wouldn't)
        yy, xx = np.mgrid[0:32, 0:40].astype(np.float32)
        x = np.stack([yy / 16 - 1, xx / 20 - 1, (yy + xx) / 36 - 1],
                     axis=-1)[None]
        wire, _ = JpegCompressor(jpeg_quality=95)(x)
        assert isinstance(wire[0], bytes)
        rec, _ = JpegDecompressor(target_dim=4)(wire)
        assert rec.shape == x.shape
        assert np.abs(rec - x).mean() < 0.05

    def test_non_rgb_passthrough(self):
        x = np.zeros((1, 8, 8, 7), np.float32)
        out, _ = JpegCompressor()(x)
        assert out is x


class TestDataLogger:
    def test_records_sizes_and_shapes(self):
        logger = DataLogger(num_bits=8)
        z = np.random.RandomState(0).randn(1, 10, 12, 3).astype(np.float32)
        logger(z)
        logger(None)  # ext-filtered image
        fp32, fp16, q8, shapes = logger.get_data()
        assert len(fp32) == 2 and fp32[1] == 0.0
        assert fp32[0] > fp16[0] > q8[0] > 0
        assert shapes[0] == (3, 10, 12)
        logger.clear()
        assert logger.get_data() == ([], [], [], [])
