import numpy as np
import pytest

from hnd_ghnd_tpu.evals import mask_rle


@pytest.fixture(scope="module")
def native_lib():
    lib = mask_rle.get_lib()
    if lib is None:
        pytest.skip("native cocomask library not built")
    return lib


def random_mask(rng, h=40, w=50, density=0.3):
    return (rng.rand(h, w) < density).astype(np.uint8)


class TestRLE:
    def test_encode_decode_roundtrip(self, rng, native_lib):
        for _ in range(5):
            m = random_mask(rng)
            runs = mask_rle.encode(m)
            rec = mask_rle.decode(runs, *m.shape)
            np.testing.assert_array_equal(rec, m)

    def test_area(self, rng, native_lib):
        m = random_mask(rng)
        assert mask_rle.area(mask_rle.encode(m)) == int(m.sum())

    def test_encode_matches_numpy_fallback(self, rng, native_lib):
        m = random_mask(rng)
        native = mask_rle.encode(m)
        # force the numpy path
        lib = mask_rle._LIB
        mask_rle._LIB = None
        try:
            fallback = mask_rle.encode(m)
        finally:
            mask_rle._LIB = lib
        np.testing.assert_array_equal(native, fallback)

    def test_iou_matrix_matches_dense(self, rng, native_lib):
        dets = [random_mask(rng) for _ in range(4)]
        gts = [random_mask(rng) for _ in range(3)]
        iscrowd = np.asarray([0, 1, 0], np.int32)
        got = mask_rle.iou_matrix([mask_rle.encode(m) for m in dets],
                                  [mask_rle.encode(m) for m in gts], iscrowd)
        for i, d in enumerate(dets):
            for j, g in enumerate(gts):
                inter = np.logical_and(d, g).sum()
                da, ga = d.sum(), g.sum()
                denom = da if iscrowd[j] else da + ga - inter
                want = inter / denom if denom else 0.0
                assert got[i, j] == pytest.approx(want, abs=1e-9), (i, j)

    def test_polygon_fill_even_odd(self, native_lib):
        # square with a square hole (even-odd: hole excluded when drawn as
        # one self-crossing ring; here two separate rings union via two calls)
        m = mask_rle.fill_polygon([2, 2, 12, 2, 12, 12, 2, 12], 16, 16)
        assert m[7, 7] == 1 and m[0, 0] == 0
        # pixel centers: box [2,12) in continuous coords covers pixels 2..11
        assert m.sum() == 100

    def test_polygon_triangle(self, native_lib):
        m = mask_rle.fill_polygon([0, 0, 10, 0, 0, 10], 12, 12)
        assert m[1, 1] == 1
        assert m[9, 9] == 0
        # roughly half the 10x10 square
        assert 35 <= m.sum() <= 55
