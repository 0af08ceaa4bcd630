"""Native fused image-prep vs the pure-Python loader path."""
import numpy as np
import pytest

from hnd_ghnd_tpu.data import native_prep
from hnd_ghnd_tpu.data import transforms as T
from hnd_ghnd_tpu.data.loader import _bounded_map


class TestPrepKernel:
    def _src(self, h=37, w=53, seed=0):
        return np.random.RandomState(seed).randint(
            0, 256, (h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("flip", [False, True])
    def test_matches_python_path(self, flip):
        if not native_prep.available():
            pytest.skip("libprep.so unavailable")
        src = self._src()
        nh, nw, _ = T.resize_geometry(37, 53, 32, 64)
        bucket = (48, 64)

        img = src[:, ::-1] if flip else src
        import cv2
        ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        ref = T.pad_to(ref, bucket).astype(np.float32) / 255.0

        out = np.empty((*bucket, 3), np.float32)
        native_prep.prep_into(src, nh, nw, flip, out)
        # float vs cv2's 11-bit fixed-point interpolation: <= ~1/255 apart
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1.5 / 255.0)
        # padding region must be exactly zero
        assert not out[nh:].any() and not out[:, nw:].any()

    def test_identity_resize_exact(self):
        if not native_prep.available():
            pytest.skip("libprep.so unavailable")
        src = self._src(16, 16)
        out = np.empty((16, 16, 3), np.float32)
        native_prep.prep_into(src, 16, 16, False, out)
        np.testing.assert_allclose(out, src.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_flip_identity_exact(self):
        if not native_prep.available():
            pytest.skip("libprep.so unavailable")
        src = self._src(16, 16)
        out = np.empty((16, 16, 3), np.float32)
        native_prep.prep_into(src, 16, 16, True, out)
        np.testing.assert_allclose(
            out, src[:, ::-1].astype(np.float32) / 255.0, atol=1e-6)


class TestBoundedMap:
    def test_order_and_completeness(self):
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(4) as pool:
            got = list(_bounded_map(pool, lambda x: x * x, range(57),
                                    window=5))
        assert got == [x * x for x in range(57)]

    def test_window_bounds_inflight(self):
        import threading
        from concurrent.futures import ThreadPoolExecutor
        lock = threading.Lock()
        live = [0]
        peak = [0]

        def work(x):
            with lock:
                live[0] += 1
                peak[0] = max(peak[0], live[0])
            import time
            time.sleep(0.002)
            with lock:
                live[0] -= 1
            return x

        with ThreadPoolExecutor(8) as pool:
            list(_bounded_map(pool, work, range(100), window=6))
        assert peak[0] <= 6


class TestLoaderParity:
    def test_native_and_python_paths_agree(self, tmp_path, monkeypatch):
        if not native_prep.available():
            pytest.skip("libprep.so unavailable")
        from tests.fixtures import make_coco_fixture
        from hnd_ghnd_tpu.data.coco import CocoDataset
        from hnd_ghnd_tpu.data.loader import DetectionLoader

        img_dir, ann_file = make_coco_fixture(
            str(tmp_path), num_images=4,
            size_range=((60, 64), (90, 96)))
        ds = CocoDataset(str(img_dir), str(ann_file))

        def batches(use_native):
            monkeypatch.setenv("HND_TPU_NATIVE_PREP",
                               "1" if use_native else "0")
            loader = DetectionLoader(ds, 2, training=True, min_sizes=(64,),
                                     max_size=128, buckets=((64, 128),),
                                     seed=3, num_workers=2)
            assert loader._use_native_prep == use_native
            return list(loader)

        nat = batches(True)
        py = batches(False)
        assert len(nat) == len(py) > 0
        for (bn, tn, _), (bp, tp, _) in zip(nat, py):
            np.testing.assert_allclose(bn["images"], bp["images"],
                                       atol=1.5 / 255.0)
            np.testing.assert_array_equal(bn["image_sizes"],
                                          bp["image_sizes"])
            np.testing.assert_allclose(tn["boxes"], tp["boxes"], rtol=1e-6)


class TestNativeJpegDecode:
    def test_matches_pil(self, tmp_path):
        import io
        from PIL import Image
        if not native_prep.available() or not hasattr(
                native_prep.get_lib(), "jpeg_decode"):
            pytest.skip("native jpeg decode unavailable")
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 256, (45, 67, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        data = buf.getvalue()
        got = native_prep.decode_jpeg(data)
        assert got is not None and got.shape == (45, 67, 3)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        # PIL bundles libjpeg-turbo, system lib may differ by IDCT rounding
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_non_jpeg_returns_none(self):
        if not native_prep.available():
            pytest.skip("libprep.so unavailable")
        assert native_prep.decode_jpeg(b"not a jpeg at all") is None

    def test_dataset_uses_native_decode(self, tmp_path):
        if not native_prep.available() or not hasattr(
                native_prep.get_lib(), "jpeg_decode"):
            pytest.skip("native jpeg decode unavailable")
        from tests.fixtures import make_coco_fixture
        from hnd_ghnd_tpu.data.coco import CocoDataset
        img_dir, ann_file = make_coco_fixture(str(tmp_path), num_images=2)
        ds = CocoDataset(str(img_dir), str(ann_file))
        img, target = ds[0]
        assert img.dtype == np.uint8 and img.ndim == 3
