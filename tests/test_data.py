import numpy as np
import pytest

from hnd_ghnd_tpu.data.coco import (CocoDataset, check_if_valid_target,
                                    rasterize_polygons, _decode_rle_counts)
from hnd_ghnd_tpu.data.loader import DetectionLoader
from hnd_ghnd_tpu.data import transforms as T

from tests.fixtures import make_coco_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_coco_fixture(str(root), num_images=10, seed=0)


@pytest.fixture(scope="module")
def kp_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_kp")
    return make_coco_fixture(str(root), num_images=6, seed=1, keypoints=True)


class TestDataset:
    def test_loads_images_and_targets(self, fixture):
        img_dir, ann_file = fixture
        ds = CocoDataset(img_dir, ann_file, with_masks=True)
        assert len(ds) == 10
        img, tgt = ds[0]
        assert img.dtype == np.uint8 and img.ndim == 3
        g = len(tgt["boxes"])
        assert g >= 1
        assert tgt["labels"].shape == (g,)
        assert tgt["masks"].shape == (g,) + img.shape[:2]
        # box coords within image, xyxy
        assert (tgt["boxes"][:, 2] > tgt["boxes"][:, 0]).all()
        # mask roughly covers its box area
        b = tgt["boxes"][0].astype(int)
        assert tgt["masks"][0, b[1]:b[3], b[0]:b[2]].mean() > 0.8

    def test_keypoints_loaded(self, kp_fixture):
        img_dir, ann_file = kp_fixture
        ds = CocoDataset(img_dir, ann_file, with_keypoints=True)
        _, tgt = ds[0]
        assert tgt["keypoints"].shape[1:] == (17, 3)

    def test_valid_target_rule(self):
        assert not check_if_valid_target([])
        assert not check_if_valid_target(
            [{"bbox": [0, 0, 1, 1]}])  # empty-ish box
        assert check_if_valid_target([{"bbox": [0, 0, 10, 10]}])
        kp_ann = {"bbox": [0, 0, 10, 10],
                  "keypoints": [1, 1, 2] * 5 + [0, 0, 0] * 12}
        assert not check_if_valid_target([kp_ann])  # 5 visible < 10
        kp_ann2 = {"bbox": [0, 0, 10, 10],
                   "keypoints": [1, 1, 2] * 10 + [0, 0, 0] * 7}
        assert check_if_valid_target([kp_ann2])

    def test_rle_roundtrip_uncompressed(self):
        mask = np.zeros((5, 4), np.uint8)
        mask[1:3, 1:3] = 1
        # column-major runs
        flat = mask.T.reshape(-1)
        counts = []
        run = 0
        val = 0
        for v in flat:
            if v == val:
                run += 1
            else:
                counts.append(run)
                run = 1
                val = v
        counts.append(run)
        rec = _decode_rle_counts(counts, 5, 4)
        np.testing.assert_array_equal(rec, mask)

    def test_polygon_rasterization(self):
        m = rasterize_polygons([[2, 2, 8, 2, 8, 6, 2, 6]], 10, 12)
        assert m[4, 5] == 1
        assert m[0, 0] == 0
        # pixel-center even-odd fill: x in [2,8) x y in [2,6) = 6*4 pixels
        assert m.sum() == 24


class TestTransforms:
    def test_resize_semantics(self):
        img = np.zeros((100, 200, 3), np.uint8)
        out, _, scale = T.resize(img, None, 64, 96)
        # max side caps: 200*0.64=128 > 96 -> scale=96/200
        assert out.shape[1] == 96
        assert scale == pytest.approx(96 / 200)

    def test_hflip_boxes_and_keypoints(self):
        img = np.zeros((10, 20, 3), np.uint8)
        tgt = {"boxes": np.asarray([[2.0, 1.0, 6.0, 5.0]], np.float32),
               "keypoints": np.zeros((1, 17, 3), np.float32)}
        tgt["keypoints"][0, 1] = [3.0, 4.0, 2]  # left_eye
        img2, t2 = T.hflip(img, tgt)
        np.testing.assert_allclose(t2["boxes"], [[14.0, 1.0, 18.0, 5.0]])
        # left_eye (idx 1) swaps to right_eye slot (idx 2), x mirrored
        assert t2["keypoints"][0, 2, 0] == pytest.approx(17.0)
        assert t2["keypoints"][0, 2, 2] == 2

    def test_bucket_selection(self):
        assert T.pick_bucket(800, 1333) == (832, 1344)
        assert T.pick_bucket(1333, 800) == (1344, 832)
        with pytest.raises(ValueError):
            T.pick_bucket(2000, 2000)


class TestLoader:
    def test_batches_share_bucket_and_static_shapes(self, fixture):
        img_dir, ann_file = fixture
        ds = CocoDataset(img_dir, ann_file)
        loader = DetectionLoader(
            ds, batch_size=4, training=True, min_sizes=(64,),
            max_size=96, buckets=((64, 96), (96, 64), (96, 96)),
            num_workers=2)
        seen = 0
        for batch, tgt, host in loader:
            b, h, w, c = batch["images"].shape
            assert b == 4 and c == 3
            assert (h, w) in ((64, 96), (96, 64), (96, 96))
            assert batch["images"].dtype == np.float32
            assert batch["images"].max() <= 1.0
            assert tgt["boxes"].shape == (4, 100, 4)
            assert (tgt["boxes"][tgt["boxes_valid"]][:, 2] <= w).all()
            seen += b
        assert seen >= 8  # full batches over 10 imgs

    def test_eval_loader_pads_remainder(self, fixture):
        img_dir, ann_file = fixture
        ds = CocoDataset(img_dir, ann_file)
        loader = DetectionLoader(
            ds, batch_size=4, training=False, min_sizes=(64,), max_size=96,
            buckets=((64, 96), (96, 64), (96, 96)), num_workers=2)
        total_real = 0
        for batch, _, host in loader:
            assert batch["images"].shape[0] == 4
            total_real += sum(not t["is_padding"] for t in host)
        assert total_real == 10

    def test_augmentation_deterministic_across_runs(self, fixture):
        """Thread-pool completion order must not affect augmentation."""
        img_dir, ann_file = fixture
        ds = CocoDataset(img_dir, ann_file)
        def collect(workers):
            loader = DetectionLoader(ds, batch_size=2, training=True,
                                     min_sizes=(64,), max_size=96,
                                     buckets=((96, 96),),
                                     num_workers=workers, seed=3)
            return [(batch["images"].sum(), tuple(t["image_id"] for t in h))
                    for batch, _, h in loader]
        a = collect(1)
        b = collect(4)
        assert [x[1] for x in a] == [x[1] for x in b]
        np.testing.assert_allclose([x[0] for x in a], [x[0] for x in b])

    def test_epoch_shuffle_changes_order(self, fixture):
        img_dir, ann_file = fixture
        ds = CocoDataset(img_dir, ann_file)
        loader = DetectionLoader(ds, batch_size=2, training=True,
                                 min_sizes=(64,), max_size=96,
                                 buckets=((96, 96),), num_workers=1)
        loader.set_epoch(0)
        ids0 = [t["image_id"] for _, _, h in loader for t in h]
        loader.set_epoch(1)
        ids1 = [t["image_id"] for _, _, h in loader for t in h]
        assert ids0 != ids1
        assert sorted(set(ids0)) == sorted(set(ids1))

    def test_val_batch_size_config(self, fixture):
        """tpu.eval_batch_size raises per-epoch VAL batching; the final
        TEST loader keeps the reference batch-1 protocol
        (src/utils/data_util.py:44-47)."""
        from hnd_ghnd_tpu.runners import common
        img_dir, ann_file = fixture
        split = {"images": img_dir, "annotations": ann_file}
        config = {
            "dataset": {"splits": {"train": split, "val": split,
                                   "test": split}, "num_workers": 1},
            "test": {"batch_size": 1},
            "tpu": {"eval_batch_size": 4, "buckets": [[96, 96]],
                    "min_sizes": [64], "max_size": 96},
        }
        train, val, test = common.loaders_from_config(
            config, "faster_rcnn", 2, shard_index=0, num_shards=1)
        assert train.batch_size == 2
        assert val.batch_size == 4
        assert test.batch_size == 1
        # without the knob, val follows the test protocol (old behavior)
        config["tpu"].pop("eval_batch_size")
        _, val2, test2 = common.loaders_from_config(
            config, "faster_rcnn", 2, shard_index=0, num_shards=1)
        assert val2.batch_size == 1 and test2.batch_size == 1
