import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.models.factory import build_model, get_iou_types
from hnd_ghnd_tpu.models.rcnn import RCNN


BUCKET = (192, 256)  # small stride-64-aligned bucket for CPU tests


def make_batch(b=2, h=BUCKET[0], w=BUCKET[1], seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "image_sizes": jnp.asarray([[h, w]] * b, dtype=jnp.int32),
        "original_sizes": jnp.asarray([[h * 2, w * 2]] * b, dtype=jnp.int32),
    }


def make_targets(b=2, g=5, seed=1):
    rng = np.random.RandomState(seed)
    xy = rng.rand(b, g, 2) * 100
    wh = rng.rand(b, g, 2) * 60 + 8
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    return {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(rng.randint(1, 91, size=(b, g)), dtype=jnp.int32),
        "boxes_valid": jnp.asarray(np.ones((b, g), dtype=bool)),
    }


@pytest.fixture(scope="module")
def faster_cfg():
    return {
        "name": "faster_rcnn",
        "backbone": {"name": "resnet50", "params": {"pretrained": False,
                                                    "freeze_layers": True}},
        "params": {"num_classes": 91, "pretrained": False},
    }


@pytest.fixture(scope="module")
def student_cfg():
    return {
        "name": "faster_rcnn",
        "backbone": {
            "name": "custom_resnet50",
            "params": {"pretrained": False, "freeze_layers": False,
                       "layer1": {"name": "Bottleneck4LargeResNet",
                                  "bottleneck_channel": 3}},
        },
        "bottleneck_transformer": {
            "order": ["quantizer", "dequantizer"],
            "components": {"quantizer": {"params": {"num_bits": 8}},
                           "dequantizer": {"params": {"num_bits": 8}}},
        },
        "params": {"num_classes": 91, "pretrained": False},
    }


@pytest.fixture(scope="module")
def teacher(faster_cfg):
    model = build_model(faster_cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


@pytest.fixture(scope="module")
def student(student_cfg):
    model = build_model(student_cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    return model, params, state


class TestBackbone:
    def test_feature_shapes(self, teacher):
        model, params, state = teacher
        batch = make_batch()
        feats, _, _, _ = model.backbone_features(
            params, state, batch["images"], training=False)
        h, w = BUCKET
        assert feats["layer1"].shape == (2, h // 4, w // 4, 256)
        assert feats["layer4"].shape == (2, h // 32, w // 32, 2048)

    def test_student_backbone_shapes_match_teacher(self, teacher, student):
        tm, tp, ts = teacher
        sm, sp, ss = student
        batch = make_batch()
        tf, _, _, _ = tm.backbone_features(tp, ts, batch["images"], training=False)
        sf, _, _, _ = sm.backbone_features(sp, ss, batch["images"], training=False)
        for k in ("layer1", "layer2", "layer3", "layer4"):
            assert tf[k].shape == sf[k].shape, k

    def test_distill_backbone_only(self, student):
        model, params, state = student
        batch = make_batch()
        feats, _, inter = model.forward(params, state, batch,
                                        distill_backbone_only=True)
        assert set(feats) == {"layer1", "layer2", "layer3", "layer4"}
        assert inter["backbone.body.layer1"] is feats["layer1"]

    def test_bottleneck_transformer_changes_output(self, student):
        model, params, state = student
        batch = make_batch()
        f1, _, _ = model.forward(params, state, batch, distill_backbone_only=True)
        f2, _, _ = model.forward(params, state, batch, distill_backbone_only=True,
                                 use_bottleneck_transformer=True)
        # 8-bit round-trip must perturb but not destroy layer1 features
        d = np.abs(np.asarray(f1["layer1"]) - np.asarray(f2["layer1"]))
        assert 0 < d.max() < 1.0


class TestInference:
    def test_eval_forward_shapes(self, teacher):
        model, params, state = teacher
        batch = make_batch()
        fwd = jax.jit(lambda p, s, b: model.forward(p, s, b, training=False))
        dets, _, _ = fwd(params, state, batch)
        assert dets["boxes"].shape == (2, 100, 4)
        assert dets["scores"].shape == (2, 100)
        assert dets["labels"].shape == (2, 100)
        assert dets["valid"].shape == (2, 100)
        # boxes scaled to original size (2x bucket)
        assert np.asarray(dets["boxes"]).max() <= BUCKET[1] * 2 + 1e-3

    def test_train_forward_losses(self, teacher):
        model, params, state = teacher
        batch = make_batch()
        targets = make_targets()
        losses, _, _ = model.forward(params, state, batch, training=True,
                                     targets=targets,
                                     rng=jax.random.PRNGKey(2))
        expected = {"loss_classifier", "loss_box_reg",
                    "loss_objectness", "loss_rpn_box_reg"}
        assert set(losses) == expected
        for k, v in losses.items():
            assert np.isfinite(np.asarray(v)), k

    def test_iou_types(self, teacher):
        model, _, _ = teacher
        assert get_iou_types(model) == ["bbox"]


class TestMaskKeypoint:
    def test_mask_rcnn_outputs(self):
        model = RCNN(kind="mask_rcnn", num_classes=11)
        params, state = model.init(jax.random.PRNGKey(3))
        batch = make_batch(b=1)
        dets, _, _ = model.forward(params, state, batch, training=False)
        assert dets["mask_probs"].shape == (1, 100, 28, 28)
        assert (np.asarray(dets["mask_probs"]) >= 0).all()

    def test_keypoint_rcnn_outputs(self):
        model = RCNN(kind="keypoint_rcnn", num_classes=2)
        params, state = model.init(jax.random.PRNGKey(4))
        batch = make_batch(b=1)
        dets, _, _ = model.forward(params, state, batch, training=False)
        assert dets["keypoint_logits"].shape == (1, 100, 56, 56, 17)

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"
