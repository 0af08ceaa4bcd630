"""int8 server-tail inference: fold correctness, integer-ness, accuracy.

The int8 tail (split/int8.py) must (a) reproduce the model's own fp tail
exactly when run in fp calibration mode (BN folding is algebra, not
approximation), (b) keep the trunk integer end to end (int8 weights, int8
inter-layer activations, int32 accumulation), and (c) track the fp features
closely after per-tensor activation quantization.
"""
import numpy as np
import pytest

from hnd_ghnd_tpu.models.factory import get_model


def _bottleneck_model(seed=0):
    cfg = {
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}}},
        "params": {"num_classes": 5, "pretrained": False},
    }
    return get_model(cfg, seed=seed)


@pytest.fixture(scope="module")
def model_pack():
    return _bottleneck_model()


def _wire_z(model, params, state, images):
    """fp bottleneck tensor after the wire codec round-trip."""
    import jax.numpy as jnp
    from hnd_ghnd_tpu.codec.quantizer import (QuantizedTensor,
                                              dequantize_tensor)
    from hnd_ghnd_tpu.split.deploy import SplitRCNN
    split = SplitRCNN(model, 8)
    head_jit, _, _ = split.build(params, state)
    q, s, zp, _ = head_jit(jnp.asarray(images))
    return np.asarray(dequantize_tensor(QuantizedTensor(q, s, zp)))


class TestFoldCorrectness:
    def test_fp_folded_walk_equals_model_tail(self, model_pack):
        """BN folding must be exact: the fp calibration walk reproduces the
        model's own eval-mode decoder + layers2-4."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi

        model, params, state = model_pack
        rng = np.random.RandomState(0)
        z = rng.rand(1, 17, 17, 3).astype(np.float32) * 4 - 2

        feats = qi.trunk_features_fp(model, params, state, z)

        body_p = params["backbone"]["body"]
        body_s = state["backbone"]["body"]
        y, _ = model.bottleneck.decode(body_p["layer1"], body_s["layer1"],
                                       jnp.asarray(z), training=False)
        ref = [y]
        for stage in (1, 2, 3):
            y = model.body._apply_stage(body_p, y, stage)
            ref.append(y)
        for got, want in zip(feats, ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-4)

    def test_weights_and_activations_are_int8(self, model_pack):
        from hnd_ghnd_tpu.split import int8 as qi

        model, params, state = model_pack
        qf = qi.quantize_folded(qi.fold_tail(model, params, state))
        convs = list(qf["dec"]) + [v for blocks in qf["stages"]
                                   for blk in blocks for v in blk.values()]
        assert len(convs) >= 4 + 13 * 3  # decoder + layers2-4 blocks
        for fw in convs:
            assert fw["qw"].dtype == np.int8
            assert fw["sw"].shape == (fw["qw"].shape[-1],)

        # the inter-layer representation of the quantized walk is int8
        kit = qi._QuantKit({"x": 0.1})
        import jax.numpy as jnp
        q, s, zp = kit.site("x", jnp.asarray([[0.35, -0.2]]))
        assert q.dtype == jnp.int8 and zp == 0
        np.testing.assert_array_equal(np.asarray(q), [[4, -2]])
        # post-ReLU sites use the full [0, 255] range with zero point -128
        qu, su, zpu = kit.site("x", jnp.asarray([[0.0, 0.1]]), unsigned=True)
        assert qu.dtype == jnp.int8 and zpu == 128
        # su = scale * 127/255 (= amax/255); 0.1/su = 2.008 -> q = 2 - 128
        np.testing.assert_array_equal(np.asarray(qu), [[-128, -126]])
        assert float(su) == pytest.approx(0.1 * 127 / 255)

    def test_int8_conv_accumulates_int32(self):
        """The quantized conv path must request int32 accumulation (the MXU
        s8 x s8 -> s32 contract), not float."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi

        kit = qi._QuantKit({"in": 1.0, "out": 1.0})
        fw = {"qw": jnp.ones((1, 1, 4, 8), jnp.int8),
              "sw": jnp.ones((8,), jnp.float32),
              "b": jnp.zeros((8,), jnp.float32), "relu": False}
        xq = kit.site("in", jnp.ones((1, 2, 2, 4), jnp.float32) * 100.0)
        jaxpr = jax.make_jaxpr(lambda q: kit._acc((q, jnp.float32(1.0), 0),
                                                  fw, 1, 0))(xq[0])
        text = str(jaxpr)
        assert "preferred_element_type=int32" in text, text


class TestZeroPointExactness:
    @pytest.mark.parametrize("pad,stride,groups", [(0, 1, 1), (1, 1, 1),
                                                   (1, 2, 1), (1, 2, 2)])
    def test_zp_conv_equals_dequantized_conv(self, pad, stride, groups):
        """The zero-point conv (incl. the border-exact ones-conv
        correction for padded convs) must equal the plain fp conv over the
        DEQUANTIZED activations/weights — the zp algebra is exact, not an
        approximation."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi

        rng = np.random.RandomState(0)
        cin, cout, k = 8, 12, 3
        w = rng.randn(k, k, cin // groups, cout).astype(np.float32)
        fw = qi.quantize_folded({"dec": [
            {"w": jnp.asarray(w), "b": jnp.asarray(
                rng.randn(cout).astype(np.float32)),
             "relu": True, "groups": groups}],
            "dec_in": None, "stages": []})["dec"][0]
        x = np.abs(rng.randn(2, 9, 9, cin)).astype(np.float32)  # post-ReLU

        kit = qi._QuantKit({"in": float(np.abs(x).max() / 127.0)})
        xq = kit.site("in", jnp.asarray(x), unsigned=True)
        got = np.asarray(kit._acc(xq, fw, stride, pad))

        # fp oracle over the dequantized tensors
        q, s, zp = xq
        x_deq = (np.asarray(q, np.float32) + zp) * float(s)
        w_deq = np.asarray(fw["qw"], np.float32) * np.asarray(fw["sw"])
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x_deq), jnp.asarray(w_deq),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups) + fw["b"]
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4,
                                   atol=2e-3)


class TestInt8Accuracy:
    def test_int8_features_track_fp(self, model_pack):
        """After calibration, the int8 trunk features stay close to fp:
        high cosine similarity at every stage output."""
        model, params, state = model_pack
        from hnd_ghnd_tpu.split import int8 as qi

        rng = np.random.RandomState(1)
        images = rng.rand(1, 64, 64, 3).astype(np.float32)
        z = _wire_z(model, params, state, images)

        scales = qi.calibrate_tail(model, params, state, [z])
        assert scales  # every site got a scale
        fp = qi.trunk_features_fp(model, params, state, z)
        q8 = qi.trunk_features_int8(model, params, state, z, scales)
        for a, b in zip(fp, q8):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            denom = np.linalg.norm(a) * np.linalg.norm(b)
            cos = float(a @ b / denom) if denom > 0 else 1.0
            assert cos > 0.95, cos

    @pytest.mark.slow  # compiles the full RoI-head tail twice
    def test_int8_tail_runs_end_to_end(self, model_pack):
        """Full wire -> int8 tail -> detection dict, same output surface as
        the fp tail."""
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi
        from hnd_ghnd_tpu.split.deploy import SplitRCNN

        model, params, state = model_pack
        rng = np.random.RandomState(2)
        images = rng.rand(1, 64, 64, 3).astype(np.float32)
        scales = qi.calibrate_from_images(model, params, state, [images])

        split = SplitRCNN(model, 8)
        head_jit, fp_tail, _ = split.build(params, state)
        q, s, zp, _ = head_jit(jnp.asarray(images))
        sizes = np.asarray([[64, 64]], np.int32)

        int8_tail = qi.Int8SplitTail(model, params, state, scales).build()
        d_fp = {k: np.asarray(v)
                for k, v in fp_tail(q, s, zp, sizes, (64, 64)).items()}
        d_q8 = {k: np.asarray(v)
                for k, v in int8_tail(q, s, zp, sizes, (64, 64)).items()}
        assert set(d_fp) == set(d_q8)
        for k in d_fp:
            assert d_fp[k].shape == d_q8[k].shape, k
        assert np.isfinite(d_q8["scores"]).all()


class TestInt8TailMaskFamily:
    @pytest.mark.slow  # compiles the mask-RCNN tail
    def test_mask_rcnn_int8_tail_end_to_end(self):
        """The int8 tail generalizes across detector families: the trunk
        fold is family-independent and the fp heads (incl. mask) consume
        the dequantized stage outputs unchanged."""
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi
        from hnd_ghnd_tpu.split.deploy import SplitRCNN

        cfg = {
            "name": "mask_rcnn",
            "backbone": {"name": "custom_resnet50",
                         "params": {"pretrained": False,
                                    "layer1": {
                                        "name": "Bottleneck4LargeResNet",
                                        "bottleneck_channel": 3}}},
            "params": {"num_classes": 5, "pretrained": False},
        }
        model, params, state = get_model(cfg, seed=1)
        rng = np.random.RandomState(3)
        images = rng.rand(1, 64, 64, 3).astype(np.float32)
        scales = qi.calibrate_from_images(model, params, state, [images])

        split = SplitRCNN(model, 8)
        head_jit, _, _ = split.build(params, state)
        q, s, zp, _ = head_jit(jnp.asarray(images))
        sizes = np.asarray([[64, 64]], np.int32)
        tail = qi.Int8SplitTail(model, params, state, scales).build()
        dets = {k: np.asarray(v)
                for k, v in tail(q, s, zp, sizes, (64, 64)).items()}
        assert "mask_probs" in dets
        assert dets["mask_probs"].shape[-2:] == (28, 28)
        assert np.isfinite(dets["mask_probs"]).all()
        assert np.isfinite(dets["scores"]).all()


class TestInt8TailKeypointFamily:
    @pytest.mark.slow  # compiles the keypoint-RCNN tail
    def test_keypoint_rcnn_int8_tail_end_to_end(self):
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split import int8 as qi
        from hnd_ghnd_tpu.split.deploy import SplitRCNN

        cfg = {
            "name": "keypoint_rcnn",
            "backbone": {"name": "custom_resnet50",
                         "params": {"pretrained": False,
                                    "layer1": {
                                        "name": "Bottleneck4LargeResNet",
                                        "bottleneck_channel": 3}}},
            "params": {"num_classes": 2, "num_keypoints": 17,
                       "pretrained": False},
        }
        model, params, state = get_model(cfg, seed=2)
        rng = np.random.RandomState(4)
        images = rng.rand(1, 64, 64, 3).astype(np.float32)
        scales = qi.calibrate_from_images(model, params, state, [images])

        split = SplitRCNN(model, 8)
        head_jit, _, _ = split.build(params, state)
        q, s, zp, _ = head_jit(jnp.asarray(images))
        sizes = np.asarray([[64, 64]], np.int32)
        tail = qi.Int8SplitTail(model, params, state, scales).build()
        dets = {k: np.asarray(v)
                for k, v in tail(q, s, zp, sizes, (64, 64)).items()}
        assert "keypoint_logits" in dets
        assert dets["keypoint_logits"].shape[-3:-1] == (56, 56)
        assert np.isfinite(dets["keypoint_logits"]).all()
