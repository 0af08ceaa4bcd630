import numpy as np
import jax.numpy as jnp
import pytest

from hnd_ghnd_tpu.ops import boxes as box_ops
from hnd_ghnd_tpu.ops import nms as nms_ops
from hnd_ghnd_tpu.ops import anchors as anchor_ops
from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align, assign_levels

from tests import oracles


def random_boxes(rng, n, size=800.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * (size / 4) + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxes:
    def test_iou_matches_oracle(self, rng):
        b1 = random_boxes(rng, 40)
        b2 = random_boxes(rng, 25)
        got = np.asarray(box_ops.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
        want = oracles.iou_matrix(b1, b2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_encode_decode_roundtrip(self, rng):
        props = random_boxes(rng, 50)
        gts = random_boxes(rng, 50)
        deltas = box_ops.encode(jnp.asarray(gts), jnp.asarray(props))
        rec = box_ops.decode(deltas, jnp.asarray(props))
        np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-2)

    def test_decode_clamps_large_deltas(self):
        base = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        deltas = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])
        out = np.asarray(box_ops.decode(deltas, base))
        w = out[0, 2] - out[0, 0]
        assert w == pytest.approx(10.0 * 1000.0 / 16.0, rel=1e-3)

    def test_clip_to_image(self):
        b = jnp.asarray([[-5.0, -5.0, 900.0, 700.0]])
        out = np.asarray(box_ops.clip_to_image(b, jnp.asarray([600, 800])))
        np.testing.assert_allclose(out, [[0.0, 0.0, 800.0, 600.0]])


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_greedy_oracle(self, seed, thresh):
        rng = np.random.RandomState(seed)
        # Cluttered scene: heavy overlap so suppression chains occur.
        b = random_boxes(rng, 200, size=200.0)
        s = rng.rand(200).astype(np.float32)
        keep = np.asarray(nms_ops.nms_keep_mask(jnp.asarray(b), jnp.asarray(s), thresh))
        want = oracles.greedy_nms(b, s, thresh)
        got_idx = np.where(keep)[0]
        assert set(got_idx) == set(want)

    def test_suppression_revival_chain(self):
        """Adversarial fixpoint case: A suppresses B; B would suppress C if
        kept.  Greedy keeps A and C, drops only B — a naive one-shot
        "suppressed by any higher-scoring overlap" heuristic would also drop
        C.  Proves the fixpoint iterates past the first approximation."""
        boxes = np.asarray([
            [0.0, 0.0, 10.0, 10.0],    # A (score .9)
            [3.0, 0.0, 13.0, 10.0],    # B overlaps A (iou ~0.54) (.8)
            [6.0, 0.0, 16.0, 10.0],    # C overlaps B (~0.54), not A (.7)
            [9.0, 0.0, 19.0, 10.0],    # D overlaps C (~0.54), not B (.6)
        ], np.float32)
        scores = np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)
        keep = np.asarray(nms_ops.nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        np.testing.assert_array_equal(keep, [True, False, True, False])
        want = oracles.greedy_nms(boxes, scores, 0.5)
        assert set(np.where(keep)[0]) == set(want)

    def test_respects_valid_mask(self, rng):
        b = random_boxes(rng, 64)
        s = rng.rand(64).astype(np.float32)
        valid = np.arange(64) < 40
        keep = np.asarray(nms_ops.nms_keep_mask(
            jnp.asarray(b), jnp.asarray(s), 0.5, jnp.asarray(valid)))
        assert not keep[40:].any()
        want = oracles.greedy_nms(b[:40], s[:40], 0.5)
        assert set(np.where(keep[:40])[0]) == set(want)

    def test_fixed_size_output(self, rng):
        b = random_boxes(rng, 128)
        s = rng.rand(128).astype(np.float32)
        idx, ok = nms_ops.nms(jnp.asarray(b), jnp.asarray(s), 0.5, 16)
        assert idx.shape == (16,)
        got_scores = np.asarray(s)[np.asarray(idx)][np.asarray(ok)]
        assert (np.diff(got_scores) <= 0).all()

    def test_batched_nms_is_per_category(self, rng):
        b = np.tile(random_boxes(rng, 32), (2, 1))  # identical boxes, 2 cats
        s = rng.rand(64).astype(np.float32)
        cats = np.repeat(np.arange(2), 32).astype(np.int32)
        keep = np.asarray(nms_ops.batched_nms_mask(
            jnp.asarray(b), jnp.asarray(s), jnp.asarray(cats), 0.5))
        for c in range(2):
            sel = cats == c
            want = oracles.greedy_nms(b[sel], s[sel], 0.5)
            assert set(np.where(keep[sel])[0]) == set(want)


class TestAnchors:
    def test_cell_anchor_values(self):
        # 32px anchor, ratios (0.5, 1, 2) — known torchvision values.
        a = anchor_ops.cell_anchors([32], [0.5, 1.0, 2.0])
        assert a.shape == (3, 4)
        # ratio 1.0 anchor is a centered 32x32 square
        sq = a[1]
        np.testing.assert_allclose(sq, [-16, -16, 16, 16])
        # ratio 0.5: wider than tall
        w = a[0, 2] - a[0, 0]
        h = a[0, 3] - a[0, 1]
        assert w > h

    def test_grid_shapes_and_strides(self):
        img = (800, 1344)
        grids = anchor_ops.fpn_grid_sizes(img)
        assert grids == [(200, 336), (100, 168), (50, 84), (25, 42), (13, 21)]
        anchors = anchor_ops.grid_anchors(grids, img)
        for (gh, gw), a in zip(grids, anchors):
            assert a.shape == (gh * gw * 3, 4)
        # first anchor of P2 centered at (0, 0)
        np.testing.assert_allclose(anchors[0][1], [-16, -16, 16, 16])
        # second cell along x shifted by stride 4
        np.testing.assert_allclose(anchors[0][4], [-12, -16, 20, 16])


class TestRoIAlign:
    def test_single_level_matches_oracle(self, rng):
        # One-level pyramid: all boxes small enough to map to P2.
        feat = rng.randn(56, 72, 8).astype(np.float32)
        feats = [jnp.asarray(feat),
                 jnp.asarray(rng.randn(28, 36, 8).astype(np.float32)),
                 jnp.asarray(rng.randn(14, 18, 8).astype(np.float32)),
                 jnp.asarray(rng.randn(7, 9, 8).astype(np.float32))]
        img_size = (224, 288)
        boxes = random_boxes(rng, 12, size=100.0)  # small -> level P2
        lv = np.asarray(assign_levels(jnp.asarray(boxes)))
        assert (lv == 0).all()
        got = np.asarray(multiscale_roi_align(feats, jnp.asarray(boxes), img_size, 7))
        want = oracles.roi_align_one_level(feat, boxes, 0.25, 7, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_multi_level_routing(self, rng):
        feats = [jnp.asarray(rng.randn(200, 336, 4).astype(np.float32)),
                 jnp.asarray(rng.randn(100, 168, 4).astype(np.float32)),
                 jnp.asarray(rng.randn(50, 84, 4).astype(np.float32)),
                 jnp.asarray(rng.randn(25, 42, 4).astype(np.float32))]
        img_size = (800, 1344)
        # Large box -> high level
        boxes = np.asarray([[0, 0, 600, 600], [10, 10, 60, 60]], dtype=np.float32)
        lv = np.asarray(assign_levels(jnp.asarray(boxes)))
        assert lv[0] == 3 and lv[1] == 0
        out = np.asarray(multiscale_roi_align(feats, jnp.asarray(boxes), img_size, 7))
        want_hi = oracles.roi_align_one_level(
            np.asarray(feats[3]), boxes[:1], 1 / 32.0, 7, 2)
        want_lo = oracles.roi_align_one_level(
            np.asarray(feats[0]), boxes[1:], 0.25, 7, 2)
        np.testing.assert_allclose(out[0], want_hi[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out[1], want_lo[0], rtol=1e-4, atol=1e-4)

    def test_invalid_rois_zeroed(self, rng):
        feats = [jnp.asarray(rng.randn(56, 56, 4).astype(np.float32))] * 4
        boxes = jnp.asarray(random_boxes(rng, 4, size=100.0))
        valid = jnp.asarray([True, True, False, False])
        out = np.asarray(multiscale_roi_align(
            feats, boxes, (224, 224), 7, boxes_valid=valid))
        assert np.abs(out[2:]).sum() == 0
        assert np.abs(out[:2]).sum() > 0


class TestBatchFlatRoIAlign:
    def test_batch_matches_per_image(self, rng):
        """The flat batch-wide gather formulation must agree exactly with
        the per-image path."""
        import jax
        from hnd_ghnd_tpu.ops.roi_align import (multiscale_roi_align,
                                                multiscale_roi_align_batch)
        B, C = 3, 32
        image_size = (64, 96)
        # pyramid sizes: strides 4, 8, 16, 32
        feats = [jnp.asarray(rng.randn(B, max(64 >> (2 + i), 1),
                                       max(96 >> (2 + i), 1), C)
                             .astype(np.float32)) for i in range(4)]
        n = 12
        xy = rng.rand(B, n, 2) * 60
        wh = rng.rand(B, n, 2) * 200 + 4  # spans several FPN levels
        boxes = jnp.asarray(
            np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(B, n) > 0.2)
        got = multiscale_roi_align_batch(feats, boxes, image_size, 7,
                                         boxes_valid=valid)
        want = jax.vmap(lambda f, b, v: multiscale_roi_align(
            f, b, image_size, 7, boxes_valid=v))(list(feats), boxes, valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestInt8RoiPool:
    """Opt-in int8 pooling table (ops/roi_align.py quant='int8'): halves the
    eval gather bytes; pooled features must track the fp path closely and
    the gathered table must actually be int8."""

    def _setup(self):
        import jax
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        feats = [jnp.asarray(rng.randn(2, 24 // s, 32 // s, 16)
                             .astype(np.float32))
                 for s in (1, 2, 4, 8)]
        boxes = rng.rand(2, 8, 4).astype(np.float32) * 40
        boxes[..., 2:] += boxes[..., :2] + 8
        return feats, jnp.asarray(boxes)

    def test_tracks_fp_pooling(self):
        import jax.numpy as jnp
        from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align_batch
        feats, boxes = self._setup()
        fp = np.asarray(multiscale_roi_align_batch(
            feats, boxes, (96, 128), 7))
        q8 = np.asarray(multiscale_roi_align_batch(
            feats, boxes, (96, 128), 7, quant="int8"))
        assert q8.dtype == fp.dtype
        # int8 per-level symmetric: elementwise error bounded by ~1 step
        amax = max(float(jnp.max(jnp.abs(f))) for f in feats)
        assert np.max(np.abs(fp - q8)) < 2.5 * amax / 127.0
        denom = np.linalg.norm(fp) * np.linalg.norm(q8)
        cos = float(fp.ravel() @ q8.ravel() / denom)
        assert cos > 0.999, cos

    def test_gather_operand_is_int8(self):
        import jax
        from hnd_ghnd_tpu.ops.roi_align import multiscale_roi_align_batch
        feats, boxes = self._setup()
        jaxpr = str(jax.make_jaxpr(
            lambda f, b: multiscale_roi_align_batch(f, b, (96, 128), 7,
                                                    quant="int8"))(feats,
                                                                   boxes))
        assert "i8[" in jaxpr  # the table fed to the gathers is int8

    def test_model_flag_plumbing(self):
        from hnd_ghnd_tpu.models.factory import build_model
        m = build_model({
            "name": "faster_rcnn",
            "backbone": {"name": "resnet50", "params": {"pretrained": False}},
            "params": {"num_classes": 5, "int8_roi_pool": True}})
        assert m.roi_heads.cfg.int8_pool
        m2 = build_model({
            "name": "faster_rcnn",
            "backbone": {"name": "resnet50", "params": {"pretrained": False}},
            "params": {"num_classes": 5}})
        assert not m2.roi_heads.cfg.int8_pool
