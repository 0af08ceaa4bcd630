"""Mask / keypoint training losses: finiteness, gradient flow, semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.models.rcnn import RCNN

B, H, W = 2, 192, 256
G = 4


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "image_sizes": jnp.asarray([[H, W]] * B, jnp.int32),
        "original_sizes": jnp.asarray([[H, W]] * B, jnp.int32),
    }


def make_targets(seed=1, with_masks=False, with_kps=False, num_classes=5):
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, G, 2) * 80
    wh = rng.rand(B, G, 2) * 60 + 20
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    t = {"boxes": jnp.asarray(boxes),
         "labels": jnp.asarray(rng.randint(1, num_classes, (B, G)), jnp.int32),
         "boxes_valid": jnp.asarray(np.ones((B, G), bool))}
    if with_masks:
        masks = np.zeros((B, G, H // 4, W // 4), np.uint8)
        for b in range(B):
            for g in range(G):
                x1, y1, x2, y2 = (boxes[b, g] / 4).astype(int)
                masks[b, g, y1:y2, x1:x2] = 1
        t["masks_q4"] = jnp.asarray(masks)
    if with_kps:
        kps = np.zeros((B, G, 17, 3), np.float32)
        for b in range(B):
            for g in range(G):
                kps[b, g, :, 0] = rng.uniform(boxes[b, g, 0], boxes[b, g, 2], 17)
                kps[b, g, :, 1] = rng.uniform(boxes[b, g, 1], boxes[b, g, 3], 17)
                kps[b, g, :, 2] = 2
        t["keypoints"] = jnp.asarray(kps)
    return t


class TestMaskLoss:
    def test_mask_rcnn_training_losses(self):
        model = RCNN(kind="mask_rcnn", num_classes=5)
        params, state = model.init(jax.random.PRNGKey(0))
        losses, _, _ = model.forward(
            params, state, make_batch(), training=True,
            targets=make_targets(with_masks=True),
            rng=jax.random.PRNGKey(1))
        assert "loss_mask" in losses
        assert np.isfinite(float(losses["loss_mask"]))
        # BCE of random logits vs ~binary targets should be near log(2)
        assert 0.1 < float(losses["loss_mask"]) < 5.0

    def test_mask_grads_reach_mask_head(self):
        model = RCNN(kind="mask_rcnn", num_classes=5)
        params, state = model.init(jax.random.PRNGKey(0))
        batch, targets = make_batch(), make_targets(with_masks=True)

        def loss_fn(p):
            losses, _, _ = model.forward(p, state, batch, training=True,
                                         targets=targets,
                                         rng=jax.random.PRNGKey(1))
            return losses["loss_mask"]

        grads = jax.grad(loss_fn)(params)
        g = grads["roi_heads"]["mask_head"]["mask_fcn1"]["w"]
        assert float(jnp.abs(g).max()) > 0


class TestKeypointLoss:
    def test_keypoint_rcnn_training_losses(self):
        model = RCNN(kind="keypoint_rcnn", num_classes=2)
        params, state = model.init(jax.random.PRNGKey(0))
        losses, _, _ = model.forward(
            params, state, make_batch(), training=True,
            targets=make_targets(with_kps=True, num_classes=2),
            rng=jax.random.PRNGKey(1))
        assert "loss_keypoint" in losses
        v = float(losses["loss_keypoint"])
        assert np.isfinite(v)
        # CE over 56*56 grid with random logits ~ log(3136) ~ 8.05
        assert 4.0 < v < 12.0

    def test_keypoint_grads_reach_kp_head(self):
        model = RCNN(kind="keypoint_rcnn", num_classes=2)
        params, state = model.init(jax.random.PRNGKey(0))
        batch = make_batch()
        targets = make_targets(with_kps=True, num_classes=2)

        def loss_fn(p):
            losses, _, _ = model.forward(p, state, batch, training=True,
                                         targets=targets,
                                         rng=jax.random.PRNGKey(1))
            return losses["loss_keypoint"]

        grads = jax.grad(loss_fn)(params)
        g = grads["roi_heads"]["keypoint_head"]["0"]["w"]
        assert float(jnp.abs(g).max()) > 0


class TestMaskProjection:
    def test_project_gt_mask_onto_own_box(self):
        from hnd_ghnd_tpu.models.roi_heads import _project_boxes_on_masks
        # full-one mask inside the box region -> target close to 1
        mask = np.zeros((1, 32, 32, 1), np.float32)
        mask[0, 4:16, 4:24, 0] = 1.0
        boxes = jnp.asarray([[16.0, 16.0, 96.0, 64.0]])  # /4 = (4,4)-(24,16)
        out = np.asarray(_project_boxes_on_masks(
            jnp.asarray(mask), boxes, 0.25, 28))
        assert out.shape == (1, 28, 28)
        assert out[0, 14, 14] > 0.9   # center inside
        assert out.mean() > 0.7
