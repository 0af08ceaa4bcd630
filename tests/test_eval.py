import numpy as np
import pytest

from hnd_ghnd_tpu.data.coco import CocoDataset
from hnd_ghnd_tpu.evals.coco_eval import (COCOEvalNP, CocoEvaluator,
                                          bbox_iou_matrix, oks_matrix)
from hnd_ghnd_tpu.evals.postprocess import paste_masks, heatmaps_to_keypoints

from tests.fixtures import make_coco_fixture


def gt(ann_id, cat, x, y, w, h, crowd=0):
    return {"id": ann_id, "category_id": cat, "bbox": [x, y, w, h],
            "area": w * h, "iscrowd": crowd}


def det(cat, x, y, w, h, score):
    return {"category_id": cat, "bbox": [x, y, w, h], "score": score,
            "area": w * h}


class TestCOCOEvalBBox:
    def test_perfect_predictions(self):
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 10, 10, 40, 40),
                               gt(2, 2, 5, 5, 20, 20)], image_id=1)
        ev.add_detections([det(1, 10, 10, 40, 40, 0.9),
                           det(2, 5, 5, 20, 20, 0.8)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[0] == pytest.approx(1.0)  # mAP
        assert stats[8] == pytest.approx(1.0)  # AR@100

    def test_partial_iou_threshold_sweep(self):
        # det iou vs gt = 0.625 -> matches thresholds .5, .55, .6 only
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 0, 0, 100, 100)], image_id=1)
        # overlap: det [0,0,100,62.5] vs gt [0,0,100,100]: inter=6250,
        # union=10000 -> iou = 0.625
        ev.add_detections([det(1, 0, 0, 100, 62.5, 0.9)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[1] == pytest.approx(1.0)      # AP@.5
        assert stats[2] == pytest.approx(0.0)      # AP@.75
        assert stats[0] == pytest.approx(0.3)      # 3 of 10 thresholds

    def test_missed_gt_halves_recall(self):
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 0, 0, 10, 10),
                               gt(2, 1, 50, 50, 10, 10)], image_id=1)
        ev.add_detections([det(1, 0, 0, 10, 10, 0.9)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[8] == pytest.approx(0.5)            # AR
        assert stats[0] == pytest.approx(51 / 101)       # 101-pt AP

    def test_low_scored_fp_does_not_hurt_ap(self):
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 0, 0, 10, 10)], image_id=1)
        ev.add_detections([det(1, 0, 0, 10, 10, 0.9),
                           det(1, 80, 80, 10, 10, 0.1)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[0] == pytest.approx(1.0)

    def test_high_scored_fp_kills_early_precision(self):
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 0, 0, 10, 10)], image_id=1)
        ev.add_detections([det(1, 0, 0, 10, 10, 0.5),
                           det(1, 80, 80, 10, 10, 0.9)], image_id=1)
        stats = ev.accumulate().summarize()
        # precision at every recall point: 1 tp after 1 fp -> 0.5
        assert stats[0] == pytest.approx(0.5)

    def test_crowd_gt_absorbs_matches_without_counting(self):
        ev = COCOEvalNP("bbox")
        ev.add_gt_annotations([gt(1, 1, 0, 0, 100, 100, crowd=1),
                               gt(2, 1, 200, 200, 10, 10)], image_id=1)
        # detection inside the crowd region: matched to crowd -> ignored
        ev.add_detections([det(1, 10, 10, 30, 30, 0.9),
                           det(1, 200, 200, 10, 10, 0.8)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[0] == pytest.approx(1.0)  # crowd det not a FP
        assert stats[8] == pytest.approx(1.0)  # only non-crowd gt counts

    def test_crowd_iou_is_intersection_over_det_area(self):
        d = np.asarray([[10.0, 10, 20, 20]])
        g = np.asarray([[0.0, 0, 100, 100]])
        iou = bbox_iou_matrix(d, g, np.asarray([1]))
        assert iou[0, 0] == pytest.approx(1.0)
        iou2 = bbox_iou_matrix(d, g, np.asarray([0]))
        assert iou2[0, 0] == pytest.approx(400 / 10000)

    def test_area_ranges(self):
        ev = COCOEvalNP("bbox")
        # small gt (16x16=256 < 1024)
        ev.add_gt_annotations([gt(1, 1, 0, 0, 16, 16)], image_id=1)
        ev.add_detections([det(1, 0, 0, 16, 16, 0.9)], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[3] == pytest.approx(1.0)   # AP small
        assert stats[5] == pytest.approx(-1.0)  # AP large: no gts


class TestCOCOEvalKeypoints:
    def test_perfect_oks(self):
        kp = []
        rng = np.random.RandomState(0)
        for i in range(17):
            kp.extend([float(10 + i * 3), float(20 + i * 2), 2])
        g = {"id": 1, "category_id": 1, "bbox": [5, 15, 60, 40],
             "area": 2400.0, "iscrowd": 0, "keypoints": kp,
             "num_keypoints": 17}
        ev = COCOEvalNP("keypoints")
        ev.add_gt_annotations([g], image_id=1)
        ev.add_detections([{"id": 1, "category_id": 1, "score": 0.9,
                            "bbox": [5, 15, 60, 40], "area": 2400.0,
                            "keypoints": kp}], image_id=1)
        stats = ev.accumulate().summarize()
        assert stats[0] == pytest.approx(1.0)

    def test_oks_decays_with_distance(self):
        kp = np.zeros((17, 3))
        kp[:, 0] = 50
        kp[:, 1] = 50
        kp[:, 2] = 2
        g = {"keypoints": kp.reshape(-1).tolist(), "bbox": [40, 40, 20, 20],
             "area": 400.0}
        d_same = kp.copy()
        d_far = kp.copy()
        d_far[:, 0] += 50
        m = oks_matrix(np.stack([d_same, d_far]), [g])
        assert m[0, 0] == pytest.approx(1.0)
        assert m[1, 0] < 0.1


class TestEndToEnd:
    def test_gt_as_predictions_gives_map_1(self, tmp_path):
        img_dir, ann_file = make_coco_fixture(str(tmp_path), num_images=6,
                                              seed=3)
        ds = CocoDataset(img_dir, ann_file)
        evaluator = CocoEvaluator(ds, ["bbox"])
        for i in range(len(ds)):
            _, tgt = ds[i]
            evaluator.update({tgt["image_id"]: {
                "boxes": tgt["boxes"],
                "scores": np.ones(len(tgt["boxes"])) * 0.9,
                "labels": tgt["labels"],
            }})
        evaluator.accumulate()
        stats = evaluator.summarize()
        assert stats["bbox"][0] == pytest.approx(1.0)

    def test_segm_gt_as_predictions(self, tmp_path):
        img_dir, ann_file = make_coco_fixture(str(tmp_path), num_images=4,
                                              seed=4)
        ds = CocoDataset(img_dir, ann_file, with_masks=True)
        evaluator = CocoEvaluator(ds, ["bbox", "segm"])
        for i in range(len(ds)):
            _, tgt = ds[i]
            evaluator.update({tgt["image_id"]: {
                "boxes": tgt["boxes"],
                "scores": np.ones(len(tgt["boxes"])) * 0.9,
                "labels": tgt["labels"],
                "masks": tgt["masks"],
            }})
        evaluator.accumulate()
        stats = evaluator.summarize()
        assert stats["segm"][0] == pytest.approx(1.0)
        assert stats["bbox"][0] == pytest.approx(1.0)


class TestPostprocess:
    def test_paste_masks_roughly_fills_box(self):
        probs = np.ones((1, 28, 28), dtype=np.float32)
        out = paste_masks(probs, np.asarray([[10.0, 20.0, 50.0, 60.0]]),
                          100, 100)
        assert out.shape == (1, 100, 100)
        inside = out[0, 25:55, 15:45]
        assert inside.mean() > 0.95
        assert out[0, :15, :].sum() == 0

    def test_finalize_accepts_bfloat16_device_outputs(self):
        """bf16 compute configs hand bf16 dets to the host postprocess;
        cv2.resize rejects bf16, so finalize must cast (regression: the
        keypoint family crashed on any bf16 eval before round 4)."""
        import ml_dtypes
        from hnd_ghnd_tpu.evals.postprocess import finalize_predictions
        bf16 = ml_dtypes.bfloat16
        d = 3
        dets = {
            "valid": np.ones((1, d), bool),
            "boxes": np.asarray([[[5, 5, 50, 50]] * d], dtype=bf16),
            "scores": np.ones((1, d), dtype=bf16),
            "labels": np.ones((1, d), np.int32),
            "mask_probs": np.ones((1, d, 28, 28), dtype=bf16),
            "keypoint_logits": np.zeros((1, d, 56, 56, 17), dtype=bf16),
            "boxes_model": np.asarray([[[10, 10, 100, 100]] * d], dtype=bf16),
        }
        out = finalize_predictions(dets, 0, (100, 100), (200, 200))
        assert out["masks"].shape == (d, 100, 100)
        assert out["keypoints"].shape == (d, 17, 3)
        assert out["boxes"].dtype == np.float32

    def test_heatmap_argmax_maps_to_box_coords(self):
        hm = np.full((1, 56, 56, 17), -5.0, dtype=np.float32)
        hm[0, 28, 14, :] = 10.0  # peak at (y=28, x=14) of 56 -> rel (.5, .25)
        boxes = np.asarray([[100.0, 200.0, 212.0, 312.0]])  # 112x112 box
        kps, scores = heatmaps_to_keypoints(hm, boxes, (1.0, 1.0))
        assert kps[0, 0, 0] == pytest.approx(100 + 0.25 * 112, abs=2.0)
        assert kps[0, 0, 1] == pytest.approx(200 + 0.5 * 112, abs=2.0)
        assert (scores[0] > 0).all()


class TestMatchGreedyNative:
    """The native coco_match (native/cocomask/cocomask.cpp) must agree with
    the pure-python reference loop on every scenario shape, including exact
    IoU ties (later gt wins) and ignored-gt fallback."""

    def test_native_matches_fallback(self):
        from hnd_ghnd_tpu.evals import coco_eval as ce
        from hnd_ghnd_tpu.evals import mask_rle
        if mask_rle.get_lib() is None:
            pytest.skip("native cocomask library not built")
        rng = np.random.RandomState(0)
        for _ in range(100):
            n_d, n_g = rng.randint(1, 12), rng.randint(1, 10)
            ious = rng.rand(n_d, n_g) * 1.05
            ious[rng.rand(n_d, n_g) < 0.3] = 0.5  # force exact ties
            gig = np.sort(rng.rand(n_g) < 0.3)  # non-ignored first
            native = ce.match_greedy(ious, gig, ce.IOU_THRS)
            lib, tried = mask_rle._LIB, mask_rle._TRIED
            mask_rle._LIB, mask_rle._TRIED = None, True
            try:
                fallback = ce.match_greedy(ious, gig, ce.IOU_THRS)
            finally:
                mask_rle._LIB, mask_rle._TRIED = lib, tried
            assert np.array_equal(native, fallback)

    def test_accumulate_scales(self):
        """500 images x 100 dets over 80 categories in a few seconds — the
        val2017-scale regression guard (reference leans on pycocotools C for
        this, src/utils/coco_eval_util.py:295-340)."""
        import time
        from hnd_ghnd_tpu.evals import coco_eval as ce
        rng = np.random.RandomState(0)
        ev = ce.COCOEvalNP("bbox")
        aid = 1
        for img in range(500):
            gts = []
            for _ in range(rng.randint(1, 12)):
                x, y = rng.rand(2) * 500
                w, h = rng.rand(2) * 150 + 5
                gts.append({"id": aid, "category_id": int(rng.randint(1, 81)),
                            "bbox": [x, y, w, h], "area": float(w * h),
                            "iscrowd": int(rng.rand() < 0.03)})
                aid += 1
            ev.add_gt_annotations(gts, img)
            dets = [{"id": k + 1, "category_id": int(rng.randint(1, 81)),
                     "bbox": [x, y, w, h], "area": float(w * h),
                     "score": float(rng.rand())}
                    for k, (x, y, w, h) in enumerate(
                        np.c_[rng.rand(100, 2) * 500,
                              rng.rand(100, 2) * 150 + 5])]
            ev.add_detections(dets, img)
        t0 = time.time()
        ev.accumulate()
        ev.summarize()
        elapsed = time.time() - t0
        assert elapsed < 30.0, f"accumulate too slow: {elapsed:.1f}s for 500 imgs"


def _rect_rle(x0, y0, w, h, H, W):
    """Column-major RLE of an axis-aligned rectangle on an HxW canvas."""
    mask = np.zeros((H, W), np.uint8)
    mask[y0:y0 + h, x0:x0 + w] = 1
    from hnd_ghnd_tpu.evals import mask_rle
    return mask_rle.encode(mask)


class TestVal2017ScaleGuards:
    """Scale guards at the real val2017 bar (5k images; the reference leans
    on pycocotools C for this, src/utils/coco_eval_util.py:295-340)."""

    def test_bbox_5k_images_under_60s(self):
        import time
        from hnd_ghnd_tpu.evals import coco_eval as ce
        rng = np.random.RandomState(0)
        ev = ce.COCOEvalNP("bbox")
        aid = 1
        for img in range(5000):
            gts = []
            for _ in range(rng.randint(1, 10)):
                x, y = rng.rand(2) * 500
                w, h = rng.rand(2) * 150 + 5
                gts.append({"id": aid, "category_id": int(rng.randint(1, 81)),
                            "bbox": [x, y, w, h], "area": float(w * h),
                            "iscrowd": int(rng.rand() < 0.03)})
                aid += 1
            ev.add_gt_annotations(gts, img)
            xy = rng.rand(100, 2) * 500
            wh = rng.rand(100, 2) * 150 + 5
            sc = rng.rand(100)
            cats = rng.randint(1, 81, 100)
            dets = [{"id": k + 1, "category_id": int(cats[k]),
                     "bbox": [xy[k, 0], xy[k, 1], wh[k, 0], wh[k, 1]],
                     "area": float(wh[k, 0] * wh[k, 1]),
                     "score": float(sc[k])} for k in range(100)]
            ev.add_detections(dets, img)
        t0 = time.time()
        ev.accumulate()
        stats = ev.summarize()
        elapsed = time.time() - t0
        assert np.isfinite(stats[0])
        assert elapsed < 60.0, f"accumulate too slow: {elapsed:.1f}s for 5k imgs"

    def test_segm_5k_images_rle_storage_bounded(self):
        """Segm at 5k-image scale: the evaluator must hold RLE, never dense
        masks — retained mask storage for 5k x 20 dets + gts stays in the
        tens of MB (dense full-image masks would be ~30 GB), and accumulate
        finishes under 60 s."""
        import time
        from hnd_ghnd_tpu.evals import coco_eval as ce
        H, W = 480, 640
        rng = np.random.RandomState(1)
        ev = ce.COCOEvalNP("segm")
        aid = 1
        for img in range(5000):
            gts = []
            for _ in range(rng.randint(1, 6)):
                x0, y0 = int(rng.randint(0, W - 80)), int(rng.randint(0, H - 80))
                w, h = int(rng.randint(10, 80)), int(rng.randint(10, 80))
                rle = _rect_rle(x0, y0, w, h, H, W)
                gts.append({"id": aid, "category_id": int(rng.randint(1, 81)),
                            "bbox": [x0, y0, w, h], "area": float(w * h),
                            "iscrowd": 0, "rle": rle})
                aid += 1
            ev.add_gt_annotations(gts, img)
            dets = []
            for k in range(20):
                x0, y0 = int(rng.randint(0, W - 80)), int(rng.randint(0, H - 80))
                w, h = int(rng.randint(10, 80)), int(rng.randint(10, 80))
                rle = _rect_rle(x0, y0, w, h, H, W)
                dets.append({"id": k + 1, "category_id": int(rng.randint(1, 81)),
                             "bbox": [x0, y0, w, h], "area": float(w * h),
                             "score": float(rng.rand()), "rle": rle})
            ev.add_detections(dets, img)
        stored = 0
        for store in (ev.gts, ev.dts):
            for recs in store.values():
                for r in recs:
                    assert "mask" not in r, "dense mask retained in evaluator"
                    stored += r["rle"].nbytes
        assert stored < 200 * 1024 * 1024, f"RLE storage too big: {stored>>20} MB"
        t0 = time.time()
        ev.accumulate()
        stats = ev.summarize()
        elapsed = time.time() - t0
        assert np.isfinite(stats[0])
        assert elapsed < 60.0, f"segm accumulate too slow: {elapsed:.1f}s"

    def test_keypoints_5k_person_images(self):
        """OKS accumulate at 5k person-image scale (vectorized oks_matrix)."""
        import time
        from hnd_ghnd_tpu.evals import coco_eval as ce
        rng = np.random.RandomState(2)
        ev = ce.COCOEvalNP("keypoints")
        aid = 1
        for img in range(5000):
            gts = []
            for _ in range(rng.randint(1, 5)):
                x0, y0 = rng.rand(2) * 400
                w, h = rng.rand(2) * 150 + 30
                kp = np.c_[x0 + rng.rand(17) * w, y0 + rng.rand(17) * h,
                           rng.randint(0, 3, 17)].reshape(-1)
                gts.append({"id": aid, "category_id": 1,
                            "bbox": [x0, y0, w, h], "area": float(w * h),
                            "iscrowd": 0, "keypoints": kp.tolist(),
                            "num_keypoints": int((kp[2::3] > 0).sum())})
                aid += 1
            ev.add_gt_annotations(gts, img)
            dets = []
            for k in range(20):
                x0, y0 = rng.rand(2) * 400
                w, h = rng.rand(2) * 150 + 30
                kp = np.c_[x0 + rng.rand(17) * w, y0 + rng.rand(17) * h,
                           np.full(17, 2)].reshape(-1)
                dets.append({"id": k + 1, "category_id": 1,
                             "bbox": [x0, y0, w, h], "area": float(w * h),
                             "score": float(rng.rand()),
                             "keypoints": kp.tolist()})
            ev.add_detections(dets, img)
        t0 = time.time()
        ev.accumulate()
        stats = ev.summarize()
        elapsed = time.time() - t0
        assert np.isfinite(stats[0])
        assert elapsed < 60.0, f"kp accumulate too slow: {elapsed:.1f}s"


class TestOksVectorized:
    def test_matches_reference_loop(self):
        """Vectorized oks_matrix vs the published per-(det,gt) loop."""
        from hnd_ghnd_tpu.evals.coco_eval import KP_SIGMAS, oks_matrix

        def oks_loop(det_kps, gts):
            vars_ = (KP_SIGMAS * 2) ** 2
            out = np.zeros((len(det_kps), len(gts)))
            for j, gt in enumerate(gts):
                g = np.asarray(gt["keypoints"], dtype=np.float64).reshape(-1, 3)
                xg, yg, vg = g[:, 0], g[:, 1], g[:, 2]
                k1 = (vg > 0).sum()
                bb = gt["bbox"]
                x0, x1 = bb[0] - bb[2], bb[0] + 2 * bb[2]
                y0, y1 = bb[1] - bb[3], bb[1] + 2 * bb[3]
                for i, d in enumerate(det_kps):
                    xd, yd = d[:, 0], d[:, 1]
                    if k1 > 0:
                        dx, dy = xd - xg, yd - yg
                    else:
                        z = np.zeros_like(xd)
                        dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                        dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
                    e = (dx ** 2 + dy ** 2) / vars_ / \
                        (gt["area"] + np.spacing(1)) / 2
                    if k1 > 0:
                        e = e[vg > 0]
                    out[i, j] = np.sum(np.exp(-e)) / e.shape[0]
            return out

        rng = np.random.RandomState(7)
        for trial in range(20):
            n_d, n_g = rng.randint(1, 8), rng.randint(1, 6)
            det_kps = rng.rand(n_d, 17, 3) * 100
            gts = []
            for _ in range(n_g):
                vis = rng.randint(0, 3, 17)
                if rng.rand() < 0.3:
                    vis[:] = 0  # exercise the box-distance branch
                kp = np.c_[rng.rand(17) * 100, rng.rand(17) * 100, vis]
                x0, y0 = rng.rand(2) * 50
                w, h = rng.rand(2) * 60 + 10
                gts.append({"keypoints": kp.reshape(-1).tolist(),
                            "bbox": [x0, y0, w, h], "area": float(w * h)})
            np.testing.assert_allclose(oks_matrix(det_kps, gts),
                                       oks_loop(det_kps, gts), rtol=1e-13)
