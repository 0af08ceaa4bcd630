"""rleFrPoly-exact polygon rasterization: native vs numpy-spec bit-equality
plus semantic pins (COCO's half-open integer-box convention)."""
import numpy as np
import pytest

from hnd_ghnd_tpu.evals import mask_rle
from hnd_ghnd_tpu.evals.mask_rle import _poly_to_rle_np, poly_to_rle


def _polys(seed=0, n=25):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(3, 12)
        cx, cy = rng.uniform(5, 45, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(1, 12, k)
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        out.append(np.stack([xs, ys], 1).reshape(-1))
    return out


class TestPolyToRLE:
    def test_native_matches_numpy_spec(self):
        if mask_rle.get_lib() is None:
            pytest.skip("native lib unavailable")
        for i, poly in enumerate(_polys()):
            got = poly_to_rle(poly, 50, 50)
            want = _poly_to_rle_np(
                np.ascontiguousarray(poly, np.float64), len(poly) // 2,
                50, 50)
            np.testing.assert_array_equal(got, want, err_msg=f"poly {i}")

    def test_integer_box_is_half_open(self):
        # rleFrPoly on an integer-vertex box fills [y0, y1) x [x0, x1)
        counts = poly_to_rle([1, 1, 4, 1, 4, 3, 1, 3], 6, 6)
        mask = mask_rle.decode(counts, 6, 6)
        want = np.zeros((6, 6), np.uint8)
        want[1:3, 1:4] = 1
        np.testing.assert_array_equal(mask, want)

    def test_degenerate_returns_empty(self):
        counts = poly_to_rle([2, 2, 3, 3], 5, 5)  # 2 vertices
        assert mask_rle.decode(counts, 5, 5).sum() == 0

    def test_out_of_canvas_clipped(self):
        counts = poly_to_rle([-5, -5, 10, -5, 10, 10, -5, 10], 6, 6)
        mask = mask_rle.decode(counts, 6, 6)
        assert mask.all()  # canvas fully covered, no wrap artifacts

    def test_total_run_length_is_canvas(self):
        for poly in _polys(seed=3, n=10):
            counts = poly_to_rle(poly, 48, 52)
            assert int(np.sum(counts)) == 48 * 52

    def test_rasterize_polygons_unions_parts(self):
        from hnd_ghnd_tpu.data.coco import rasterize_polygons
        m = rasterize_polygons(
            [[1, 1, 4, 1, 4, 3, 1, 3], [10, 10, 14, 10, 14, 14, 10, 14]],
            20, 20)
        assert m[1:3, 1:4].all() and m[10:14, 10:14].all()
        assert m.sum() == 6 + 16
