"""Device-side keypoint decode (ops/kp_decode.py) vs the host oracle.

The host oracle (evals/postprocess.heatmaps_to_keypoints) is
torchvision-exact (reference rcnn.py:334-345 semantics).  The device decode
samples the same cubic surface on a static grid; these tests pin:
  * the cubic resize matrix against cv2.INTER_CUBIC itself,
  * bit-level agreement when the box size equals the static grid (the two
    decodes then sample identical positions),
  * bounded quantization error on realistic blob heatmaps across box scales.
"""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from hnd_ghnd_tpu.evals.postprocess import heatmaps_to_keypoints
from hnd_ghnd_tpu.ops.kp_decode import (cubic_resize_matrix,
                                        device_keypoint_argmax,
                                        keypoints_from_device_argmax)

S = 56
K = 17


def blob_heatmaps(n, seed=0, s=S, k=K):
    """Realistic heatmaps: one dominant Gaussian blob per channel + noise
    (random iid logits would be an adversarial tie-breaking test, not a
    model-output test)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    hm = np.zeros((n, s, s, k), np.float32)
    for i in range(n):
        for j in range(k):
            cy, cx = rng.uniform(4, s - 4, 2)
            sig = rng.uniform(1.5, 4.0)
            hm[i, :, :, j] = 8.0 * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
    hm += rng.randn(n, s, s, k).astype(np.float32) * 0.05
    return hm


class TestCubicMatrix:
    @pytest.mark.parametrize("dst", [224, 150, 56, 37])
    def test_matches_cv2_inter_cubic(self, dst):
        rng = np.random.RandomState(1)
        f = rng.randn(S, S).astype(np.float32)
        m = cubic_resize_matrix(S, dst)
        got = m @ f @ m.T
        want = cv2.resize(f, (dst, dst), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_rows_sum_to_one(self):
        m = cubic_resize_matrix(S, 224)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-6)


class TestDeviceDecode:
    def test_exact_when_box_matches_grid(self):
        """A box of exactly grid x grid pixels makes torchvision's dynamic
        resize and the device's static upsample sample the SAME positions —
        the decodes must then agree to float tolerance."""
        g = 224
        hm = blob_heatmaps(6, seed=2)
        boxes = np.tile(np.asarray([[10.0, 20.0, 10.0 + g, 20.0 + g]],
                                   np.float32), (6, 1))
        want_kps, want_scores = heatmaps_to_keypoints(hm, boxes, (1.0, 1.0))

        u, v, score = device_keypoint_argmax(
            jnp.asarray(hm)[None], grid=g)
        got_kps, got_scores = keypoints_from_device_argmax(
            np.asarray(u)[0], np.asarray(v)[0], np.asarray(score)[0],
            boxes, (1.0, 1.0))
        np.testing.assert_allclose(got_kps[..., :2], want_kps[..., :2],
                                   atol=1e-2)
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4,
                                   atol=1e-4)

    def test_quantization_bound_across_box_scales(self):
        """Across box scales the two decodes pick argmax on different grids
        of the same surface: the keypoint delta must stay within one
        heatmap cell (w/S) + one device-grid cell (w/G) per axis."""
        g = 224
        n = 8
        hm = blob_heatmaps(n, seed=3)
        rng = np.random.RandomState(4)
        sizes = rng.uniform(30, 700, (n, 2)).astype(np.float32)
        x1y1 = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        boxes = np.concatenate([x1y1, x1y1 + sizes], 1)

        want_kps, want_scores = heatmaps_to_keypoints(hm, boxes, (1.0, 1.0))
        u, v, score = device_keypoint_argmax(jnp.asarray(hm)[None], grid=g)
        got_kps, got_scores = keypoints_from_device_argmax(
            np.asarray(u)[0], np.asarray(v)[0], np.asarray(score)[0],
            boxes, (1.0, 1.0))

        w = np.maximum(boxes[:, 2] - boxes[:, 0], 1.0)[:, None]
        h = np.maximum(boxes[:, 3] - boxes[:, 1], 1.0)[:, None]
        tol_x = w / S + w / g
        tol_y = h / S + h / g
        dx = np.abs(got_kps[..., 0] - want_kps[..., 0])
        dy = np.abs(got_kps[..., 1] - want_kps[..., 1])
        assert (dx <= tol_x).mean() > 0.98, f"x agreement {(dx <= tol_x).mean()}"
        assert (dy <= tol_y).mean() > 0.98, f"y agreement {(dy <= tol_y).mean()}"
        # scores are surface samples on different grids: on extreme aspect
        # ratios the HOST grid is the coarse one (e.g. rh=35 for a 684x34
        # box vs the device's 224) and undershoots the peak — deltas up to
        # ~10% rel are grid effects, not decode bugs.  COCO keypoint eval
        # never consumes per-keypoint scores (OKS uses positions + the
        # detection score), so only a sanity bound is pinned here.
        np.testing.assert_allclose(got_scores, want_scores, atol=1.0)

    @pytest.mark.slow
    def test_model_device_decode_pipeline(self):
        """kp_decode='device' swaps the [B,D,56,56,K] heatmap output for
        [B,D,K] argmax triples and finalize_predictions consumes them."""
        import jax
        from hnd_ghnd_tpu.models.rcnn import RCNN
        from hnd_ghnd_tpu.evals.postprocess import finalize_predictions

        model = RCNN(kind="keypoint_rcnn", num_classes=2,
                     kp_decode="device", kp_decode_grid=112)
        params, state = model.init(jax.random.PRNGKey(4))
        rng = np.random.RandomState(0)
        h, w = 192, 256
        batch = {"images": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
                 "image_sizes": jnp.asarray([[h, w]], jnp.int32),
                 "original_sizes": jnp.asarray([[h // 2, w // 2]], jnp.int32)}
        dets, _, _ = model.forward(params, state, batch, training=False)
        assert "keypoint_logits" not in dets
        assert dets["kp_u"].shape == (1, 100, K)
        assert dets["kp_score"].shape == (1, 100, K)

        out = finalize_predictions(
            {k: np.asarray(v) for k, v in dets.items()}, 0,
            (h // 2, w // 2), (h, w))
        n = out["boxes"].shape[0]
        assert out["keypoints"].shape == (n, K, 3)
        assert out["keypoints_scores"].shape == (n, K)
        if n:
            assert (out["keypoints"][..., 0] <= w).all()
            assert np.isfinite(out["keypoints"]).all()

    def test_batch_and_dtype_handling(self):
        hm = blob_heatmaps(3, seed=5).astype(np.float16)  # low-precision in
        u, v, score = device_keypoint_argmax(
            jnp.asarray(hm, jnp.bfloat16)[None], grid=112)
        assert u.shape == (1, 3, K) and score.dtype == jnp.float32
        assert np.isfinite(np.asarray(score)).all()
        assert (np.asarray(u) >= -0.5).all() and (np.asarray(u) <= S).all()
