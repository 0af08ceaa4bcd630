"""Ext neural-filter gating semantics in the full (unsplit) model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.models.factory import build_model


def build_ext_model(threshold):
    return build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False, "freeze_layers": True,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}},
                     "ext_config": {"backbone_frozen": True,
                                    "threshold": threshold}},
        "bottleneck_transformer": {
            "order": ["quantizer", "dequantizer"],
            "components": {"quantizer": {"params": {"num_bits": 8}},
                           "dequantizer": {"params": {"num_bits": 8}}}},
        "params": {"num_classes": 5},
    })


def make_batch(b=2):
    rng = np.random.RandomState(0)
    return {"images": jnp.asarray(rng.rand(b, 96, 128, 3).astype(np.float32)),
            "image_sizes": jnp.asarray([[96, 128]] * b, jnp.int32),
            "original_sizes": jnp.asarray([[96, 128]] * b, jnp.int32)}


class TestExtGating:
    def test_all_predictions_masked_when_filter_fires(self):
        # threshold 1.1: softmax prob can never reach it -> every image gated
        model = build_ext_model(1.1)
        params, state = model.init(jax.random.PRNGKey(0))
        dets, _, _ = model.forward(params, state, make_batch(),
                                   training=False)
        assert not np.asarray(dets["valid"]).any()
        assert np.asarray(dets["scores"]).max() == 0.0
        assert "ext_logits" in dets

    def test_nothing_masked_at_zero_threshold(self):
        model = build_ext_model(0.0)
        params, state = model.init(jax.random.PRNGKey(0))
        dets, _, _ = model.forward(params, state, make_batch(),
                                   training=False)
        # gate passes; validity determined by detection pipeline alone
        ungated = build_ext_model(0.0)
        assert np.asarray(dets["ext_logits"]).shape == (2, 2)

    def test_ext_training_mode_returns_logits_only(self):
        model = build_ext_model(0.01)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, _, inter = model.forward(params, state, make_batch(),
                                         training=True, ext_training=True)
        assert logits.shape == (2, 2)
        # raw logits in training (no softmax): not a simplex
        s = np.asarray(jax.nn.softmax(logits, -1)).sum(-1)
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)
        assert inter["backbone.body.layer1"] is None

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"
