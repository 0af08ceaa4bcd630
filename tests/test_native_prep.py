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


    def test_u8_slot_matches_f32_rounded(self):
        """uint8-wire mode: same geometry as the f32 path, values the
        rounded codes (prep_image_u8)."""
        if not native_prep.supports_u8():
            pytest.skip("libprep.so without prep_image_u8")
        src = self._src()
        nh, nw, _ = T.resize_geometry(37, 53, 32, 64)
        bucket = (48, 64)
        f32 = np.empty((*bucket, 3), np.float32)
        u8 = np.empty((*bucket, 3), np.uint8)
        native_prep.prep_into(src, nh, nw, True, f32)
        native_prep.prep_into(src, nh, nw, True, u8)
        # +-1 code: the f32 slot stores v/255 (reconstruction not
        # bit-identical) and np.rint ties-to-even vs the C round-half-up
        diff = np.abs(u8.astype(np.int32)
                      - np.rint(f32 * 255.0).astype(np.int32))
        assert diff.max() <= 1
        assert not u8[nh:].any() and not u8[:, nw:].any()


class TestUint8Wire:
    def test_loader_pixel_dtype_uint8(self, tmp_path):
        """Loader u8 mode emits uint8 batches matching the f32 batches to
        one code, on both the native and python paths."""
        from tests.fixtures import make_coco_fixture
        from hnd_ghnd_tpu.data.coco import CocoDataset
        from hnd_ghnd_tpu.data.loader import DetectionLoader

        img_dir, ann_file = make_coco_fixture(
            str(tmp_path), num_images=4,
            size_range=((60, 64), (90, 96)))
        ds = CocoDataset(str(img_dir), str(ann_file))

        def batches(dtype):
            loader = DetectionLoader(ds, 2, training=True, min_sizes=(64,),
                                     max_size=128, buckets=((64, 128),),
                                     seed=3, num_workers=2,
                                     pixel_dtype=dtype)
            return list(loader)

        f32 = batches("float32")
        u8 = batches("uint8")
        assert len(f32) == len(u8) > 0
        for (bf, tf, _), (bu, tu, _) in zip(f32, u8):
            assert bu["images"].dtype == np.uint8
            np.testing.assert_allclose(
                bu["images"].astype(np.float32) / 255.0, bf["images"],
                atol=1.0 / 255.0)
            np.testing.assert_array_equal(bu["image_sizes"],
                                          bf["image_sizes"])
            np.testing.assert_allclose(tu["boxes"], tf["boxes"], rtol=1e-6)

    def test_images_to_compute_dequantizes(self):
        import jax.numpy as jnp
        from hnd_ghnd_tpu.parallel.mesh import images_to_compute
        u8 = jnp.asarray([[0, 128, 255]], jnp.uint8)
        out = images_to_compute(u8, jnp.float32)
        np.testing.assert_allclose(np.asarray(out),
                                   [[0.0, 128 / 255, 1.0]], rtol=1e-6)
        f = jnp.asarray([[0.25]], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(images_to_compute(f, jnp.float32)), [[0.25]])

    def test_eval_forward_u8_equals_dequantized_f32(self):
        """JitCache.eval_forward on a u8 batch must equal the same batch
        dequantized on host — the in-jit *1/255 is the only difference."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.models.rcnn import RCNN
        from hnd_ghnd_tpu.models.rpn import RPNConfig
        from hnd_ghnd_tpu.runners.common import JitCache

        rpn_cfg = RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16)
        model = RCNN(kind="faster_rcnn", backbone_name="resnet18",
                     rpn_cfg=rpn_cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        jits = JitCache(model)
        fwd = jits.eval_forward((1, 64, 64, 3), False)
        rng = np.random.RandomState(1)
        u8 = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
        base = {"image_sizes": jnp.asarray([[64, 64]], jnp.int32),
                "original_sizes": jnp.asarray([[64, 64]], jnp.int32)}
        d_u8 = fwd(params, state, dict(base, images=jnp.asarray(u8)))
        d_f32 = fwd(params, state, dict(
            base, images=jnp.asarray(u8.astype(np.float32)) / 255.0))
        for k in d_u8:
            np.testing.assert_allclose(np.asarray(d_u8[k]),
                                       np.asarray(d_f32[k]),
                                       rtol=1e-5, atol=1e-5)

    def test_distill_step_accepts_u8_batch(self):
        """The jitted distill step produces (near-)identical losses from a
        u8 batch and its dequantized f32 twin."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.distill.box import DistillationBox
        from hnd_ghnd_tpu.models.factory import build_model
        from hnd_ghnd_tpu.models.rcnn import RCNN
        from hnd_ghnd_tpu.models.rpn import RPNConfig
        from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                                make_distill_train_step)

        rpn_cfg = RPNConfig(pre_nms_top_n_train=32, post_nms_top_n_train=16)
        teacher = RCNN(kind="faster_rcnn", backbone_name="resnet18",
                       rpn_cfg=rpn_cfg)
        student = RCNN(kind="faster_rcnn", backbone_name="resnet18",
                       rpn_cfg=rpn_cfg)
        tp, ts = teacher.init(jax.random.PRNGKey(0))
        sp, ss = student.init(jax.random.PRNGKey(1))
        criterion = {"type": "general", "params": {"org_loss_factor": 0.0},
                     "terms": {"layer1": {
                         "ts_modules": ["backbone.body.layer1"] * 2,
                         "criterion": {"type": "MSELoss",
                                       "params": {"reduction": "sum"}},
                         "factor": 1.0}}}
        box = DistillationBox(teacher, student, criterion)
        opt, _ = build_optimizer({"type": "Adam", "params": {"lr": 1e-3}})
        step = make_distill_train_step(box, opt, [], donate=False,
                                       compute_dtype=jnp.float32)
        os_ = opt.init(sp)
        rng = np.random.RandomState(0)
        u8_imgs = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
        base = {"image_sizes": jnp.asarray([[64, 64]], jnp.int32),
                "original_sizes": jnp.asarray([[64, 64]], jnp.int32)}
        key = jax.random.PRNGKey(2)
        loss_u8, *_ = step(tp, ts, sp, ss, os_,
                           dict(base, images=jnp.asarray(u8_imgs)), key)
        loss_f32, *_ = step(tp, ts, sp, ss, os_,
                            dict(base, images=jnp.asarray(
                                u8_imgs.astype(np.float32) / 255.0)), key)
        np.testing.assert_allclose(float(loss_u8), float(loss_f32),
                                   rtol=1e-5)


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
