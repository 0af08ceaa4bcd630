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

    def test_jpeg_components_build_host_side_chain(self):
        """Reference TRANSFORMER_CLASS_DICT accepts jpeg_compressor /
        jpeg_decompressor in the chain (transformer.py:156-174); a YAML
        naming them must build (host-side) rather than crash."""
        cfg = {"order": ["jpeg_compressor", "jpeg_decompressor"],
               "components": {
                   "jpeg_compressor": {"params": {"jpeg_quality": 95,
                                                  "tmp_dir_path": "./tmp/"}},
                   "jpeg_decompressor": {"params": {"tmp_dir_path": "./tmp/"}},
               }}
        chain = get_bottleneck_transformer(cfg)
        assert chain is not None and chain.host_side
        yy, xx = np.mgrid[0:14, 0:18].astype(np.float32)
        x = np.stack([yy / 14, xx / 18, (yy + xx) / 32], -1)  # smooth ramp
        out, _ = chain(x)
        assert out.shape == (1, 14, 18, 3)
        assert np.abs(out[0] - x).mean() < 0.05  # lossy but close at q95

    def test_mixed_quant_jpeg_chain_host_side(self):
        cfg = {"order": ["quantizer", "dequantizer",
                         "jpeg_compressor", "jpeg_decompressor"],
               "components": {
                   "quantizer": {"params": {"num_bits": 8}},
                   "dequantizer": {"params": {"num_bits": 8}},
                   "jpeg_compressor": {"params": {}},
                   "jpeg_decompressor": {"params": {}},
               }}
        chain = get_bottleneck_transformer(cfg)
        assert chain.host_side
        x = np.random.RandomState(1).rand(10, 12, 3).astype(np.float32)
        out, _ = chain(x)
        assert out.shape == (1, 10, 12, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_transformer_still_rejected(self):
        cfg = {"order": ["middle_out"],
               "components": {"middle_out": {"params": {}}}}
        with pytest.raises(KeyError):
            get_bottleneck_transformer(cfg)

    def test_constant_tensor_roundtrip_no_nans(self):
        """Zero-range guard: a constant bottleneck tensor (ext-gated empty
        image, black frame) must quantize to finite values with error
        bounded by the codec's own step size."""
        from hnd_ghnd_tpu.codec.quantizer import (dequantize_tensor,
                                                  quantize_tensor)
        for c in (0.0, 1.0, -3.25, 7.6):
            x = jnp.full((2, 4, 4, 3), c, jnp.float32)
            rec = dequantize_tensor(quantize_tensor(x, 8))
            assert np.isfinite(np.asarray(rec)).all()
            assert np.abs(np.asarray(rec) - c).max() <= 0.5

    def test_constant_tensor_host_quantizer_no_nans(self):
        from hnd_ghnd_tpu.codec.jpeg import HostDequantizer, HostQuantizer
        x = np.full((4, 4, 3), -2.5, np.float32)
        q, _ = HostQuantizer(8)(x)
        rec, _ = HostDequantizer(8)(q)
        assert np.isfinite(rec).all()
        assert np.abs(rec - x).max() <= 0.5


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


class TestHostTransformerInModel:
    def test_bottleneck_jpeg_roundtrip_under_jit(self):
        """The host-side JPEG chain must run inside a jitted eval forward
        via the pure_callback hand-off (reference applies it via a forward
        hook between encoder and decoder, src/models/mimic/base.py:50-58)."""
        import jax
        from hnd_ghnd_tpu.models.bottleneck import Bottleneck4LargeResNet

        cfg = {"order": ["jpeg_compressor", "jpeg_decompressor"],
               "components": {"jpeg_compressor": {"params": {}},
                              "jpeg_decompressor": {"params": {}}}}
        chain = get_bottleneck_transformer(cfg)
        bott = Bottleneck4LargeResNet(3, host_transformer=chain)
        params, state = bott.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(2, 64, 8, 10).astype(np.float32)
                        .transpose(0, 2, 3, 1))

        @jax.jit
        def fwd(p, s, x):
            y, _, _ = bott.apply(p, s, x, training=False,
                                 use_bottleneck_transformer=True)
            return y

        y_jpeg = fwd(params, state, x)
        y_plain, _, _ = bott.apply(params, state, x, training=False,
                                   use_bottleneck_transformer=False)
        assert np.isfinite(np.asarray(y_jpeg)).all()
        # the JPEG wire is lossy but close; and it must actually differ
        diff = np.abs(np.asarray(y_jpeg) - np.asarray(y_plain))
        assert diff.max() > 0
        assert diff.mean() < 0.25
