// cocomask: native RLE mask codec + IoU for COCO-style evaluation.
//
// The reference leans on pycocotools' C extension for RLE encode/decode,
// mask IoU, and polygon rasterization (reference: src/utils/coco_util.py:9,
// src/utils/coco_eval_util.py:6).  pycocotools is absent in this
// environment, so this is a from-scratch implementation of the same
// well-known algorithms (column-major run-length masks, LEB128-style
// compressed counts, run-intersection IoU, even-odd scanline polygon fill),
// exposed through a C ABI for ctypes.
//
// Build: tools/build_native.sh  ->  libcocomask.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE encode: binary mask [h, w] (row-major uint8) -> column-major run
// lengths. Returns number of runs written into `counts` (caller allocates
// h * w + 1 entries worst case).
// ---------------------------------------------------------------------------
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                   uint32_t* counts) {
    int64_t n = 0;
    uint8_t cur = 0;  // runs always start with the zero value
    uint32_t run = 0;
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v == cur) {
                ++run;
            } else {
                counts[n++] = run;
                cur = v;
                run = 1;
            }
        }
    }
    counts[n++] = run;
    return n;
}

// RLE decode: runs -> binary mask [h, w] row-major.
void rle_decode(const uint32_t* counts, int64_t n_counts, int64_t h,
                int64_t w, uint8_t* mask) {
    int64_t pos = 0;
    uint8_t val = 0;
    for (int64_t i = 0; i < n_counts; ++i) {
        for (uint32_t k = 0; k < counts[i]; ++k) {
            int64_t x = pos / h;
            int64_t y = pos % h;
            if (x < w) mask[y * w + x] = val;
            ++pos;
        }
        val = 1 - val;
    }
}

// Area of an RLE (sum of odd runs).
int64_t rle_area(const uint32_t* counts, int64_t n_counts) {
    int64_t a = 0;
    for (int64_t i = 1; i < n_counts; i += 2) a += counts[i];
    return a;
}

// ---------------------------------------------------------------------------
// IoU between two RLEs over the same canvas via run merging — O(runs), no
// mask materialization.  iscrowd: denominator is the det area only.
// ---------------------------------------------------------------------------
static int64_t rle_intersection(const uint32_t* a, int64_t na,
                                const uint32_t* b, int64_t nb) {
    int64_t ia = 0, ib = 0;
    int64_t ca = a[0], cb = b[0];  // remaining length of current run
    uint8_t va = 0, vb = 0;
    int64_t inter = 0;
    while (ia < na && ib < nb) {
        int64_t step = std::min(ca, cb);
        if (va && vb) inter += step;
        ca -= step;
        cb -= step;
        if (ca == 0) {
            ++ia;
            if (ia < na) ca = a[ia];
            va = 1 - va;
        }
        if (cb == 0) {
            ++ib;
            if (ib < nb) cb = b[ib];
            vb = 1 - vb;
        }
    }
    return inter;
}

double rle_iou(const uint32_t* det, int64_t n_det, const uint32_t* gt,
               int64_t n_gt, int32_t iscrowd) {
    int64_t inter = rle_intersection(det, n_det, gt, n_gt);
    int64_t da = rle_area(det, n_det);
    int64_t ga = rle_area(gt, n_gt);
    double denom = iscrowd ? (double)da : (double)(da + ga - inter);
    return denom > 0 ? (double)inter / denom : 0.0;
}

// Batched IoU: dets/gts as concatenated runs with offsets.
void rle_iou_matrix(const uint32_t* det_runs, const int64_t* det_off,
                    int64_t n_det, const uint32_t* gt_runs,
                    const int64_t* gt_off, int64_t n_gt,
                    const int32_t* iscrowd, double* out) {
    for (int64_t i = 0; i < n_det; ++i) {
        const uint32_t* d = det_runs + det_off[i];
        int64_t nd = det_off[i + 1] - det_off[i];
        for (int64_t j = 0; j < n_gt; ++j) {
            const uint32_t* g = gt_runs + gt_off[j];
            int64_t ng = gt_off[j + 1] - gt_off[j];
            out[i * n_gt + j] = rle_iou(d, nd, g, ng, iscrowd[j]);
        }
    }
}

// ---------------------------------------------------------------------------
// Greedy COCOeval detection<->GT matcher (the published evaluateImg inner
// loop, reference consumed it via pycocotools' COCOeval.evaluateImg —
// /root/reference/src/utils/coco_eval_util.py:295-340).  Inputs:
//   ious      [n_d, n_g] row-major, gts pre-sorted non-ignored-first
//   g_ignore  [n_g] 0/1
//   thrs      [n_t] IoU thresholds
// Output:
//   dt_m      [n_t, n_d] index of the matched (sorted) gt, or -1.
// Semantics replicated exactly: detections in descending-score order each
// take the best still-unmatched gt (later gt wins IoU ties); ignored gts
// are rematchable and only reachable when no non-ignored gt qualifies.
// ---------------------------------------------------------------------------
void coco_match(const double* ious, int64_t n_d, int64_t n_g,
                const uint8_t* g_ignore, const double* thrs, int64_t n_t,
                int32_t* dt_m) {
    std::vector<uint8_t> gtm(n_g);
    for (int64_t t = 0; t < n_t; ++t) {
        std::fill(gtm.begin(), gtm.end(), 0);
        for (int64_t d = 0; d < n_d; ++d) {
            double best = std::min(thrs[t], 1.0 - 1e-10);
            int64_t m = -1;
            const double* row = ious + d * n_g;
            for (int64_t g = 0; g < n_g; ++g) {
                if (gtm[g] && !g_ignore[g]) continue;
                if (m > -1 && !g_ignore[m] && g_ignore[g]) break;
                if (row[g] < best) continue;
                best = row[g];
                m = g;
            }
            dt_m[t * n_d + d] = (int32_t)m;
            if (m > -1) gtm[m] = 1;
        }
    }
}

// ---------------------------------------------------------------------------
// Polygon rasterization: even-odd scanline fill at pixel centers
// (x + 0.5, y + 0.5), vertices in (x0, y0, x1, y1, ...) order.
// Fills a row-major [h, w] uint8 mask (OR-ed into the buffer so multiple
// parts union).
// ---------------------------------------------------------------------------
void fill_polygon(const double* xy, int64_t n_vertices, int64_t h, int64_t w,
                  uint8_t* mask) {
    if (n_vertices < 3) return;
    std::vector<double> xs(n_vertices), ys(n_vertices);
    double ymin = 1e30, ymax = -1e30;
    for (int64_t i = 0; i < n_vertices; ++i) {
        xs[i] = xy[2 * i];
        ys[i] = xy[2 * i + 1];
        ymin = std::min(ymin, ys[i]);
        ymax = std::max(ymax, ys[i]);
    }
    int64_t y0 = std::max<int64_t>(0, (int64_t)std::floor(ymin));
    int64_t y1 = std::min<int64_t>(h - 1, (int64_t)std::ceil(ymax));
    std::vector<double> nodes;
    for (int64_t y = y0; y <= y1; ++y) {
        double cy = y + 0.5;
        nodes.clear();
        for (int64_t i = 0, j = n_vertices - 1; i < n_vertices; j = i++) {
            double yi = ys[i], yj = ys[j];
            if ((yi <= cy && yj > cy) || (yj <= cy && yi > cy)) {
                double t = (cy - yi) / (yj - yi);
                nodes.push_back(xs[i] + t * (xs[j] - xs[i]));
            }
        }
        std::sort(nodes.begin(), nodes.end());
        for (size_t k = 0; k + 1 < nodes.size(); k += 2) {
            int64_t xa = std::max<int64_t>(0, (int64_t)std::ceil(nodes[k] - 0.5));
            int64_t xb = std::min<int64_t>(w - 1,
                                           (int64_t)std::floor(nodes[k + 1] - 0.5));
            for (int64_t x = xa; x <= xb; ++x) mask[y * w + x] = 1;
        }
    }
}

// ---------------------------------------------------------------------------
// Exact COCO polygon -> RLE (the pycocotools rleFrPoly boundary semantics):
// vertices are scaled 5x and rounded, the boundary is walked densely along
// the major axis of each edge, column-boundary crossings are downsampled
// back to pixel resolution, and the crossing set is turned into column-major
// run lengths via sort + diff + zero-run merging.  This reproduces COCO's
// published ground-truth rasterization bit-for-bit (the scanline fill above
// differs by sub-pixel boundary rules).  Returns the number of counts
// written, or -1 if the output buffer is too small.
// ---------------------------------------------------------------------------
int64_t poly_to_rle(const double* xy, int64_t k, int64_t h, int64_t w,
                    uint32_t* counts_out, int64_t max_counts) {
    const double scale = 5.0;
    if (k < 3) {
        if (max_counts < 1) return -1;
        counts_out[0] = (uint32_t)(h * w);
        return 1;
    }
    std::vector<long long> x(k + 1), y(k + 1);
    for (int64_t j = 0; j < k; ++j) {
        x[j] = (long long)(scale * xy[2 * j] + 0.5);
        y[j] = (long long)(scale * xy[2 * j + 1] + 0.5);
    }
    x[k] = x[0];
    y[k] = y[0];

    // dense boundary walk
    std::vector<long long> u, v;
    for (int64_t j = 0; j < k; ++j) {
        long long xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
        long long dx = std::llabs(xe - xs), dy = std::llabs(ys - ye);
        bool flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
        if (flip) {
            std::swap(xs, xe);
            std::swap(ys, ye);
        }
        if (dx >= dy) {
            double s = dx ? (double)(ye - ys) / (double)dx : 0.0;
            for (long long d = 0; d <= dx; ++d) {
                long long t = flip ? dx - d : d;
                u.push_back(t + xs);
                v.push_back((long long)(ys + s * t + 0.5));
            }
        } else {
            double s = dy ? (double)(xe - xs) / (double)dy : 0.0;
            for (long long d = 0; d <= dy; ++d) {
                long long t = flip ? dy - d : d;
                v.push_back(t + ys);
                u.push_back((long long)(xs + s * t + 0.5));
            }
        }
    }

    // column-boundary crossings, downsampled to pixel resolution
    std::vector<long long> cx, cy;
    for (size_t j = 1; j < u.size(); ++j) {
        if (u[j] == u[j - 1]) continue;
        double xd = (double)(u[j] < u[j - 1] ? u[j] : u[j] - 1);
        xd = (xd + 0.5) / scale - 0.5;
        if (std::floor(xd) != xd || xd < 0 || xd > (double)(w - 1)) continue;
        double yd = (double)(v[j] < v[j - 1] ? v[j] : v[j - 1]);
        yd = (yd + 0.5) / scale - 0.5;
        if (yd < 0) yd = 0;
        else if (yd > (double)h) yd = (double)h;
        yd = std::ceil(yd);
        cx.push_back((long long)xd);
        cy.push_back((long long)yd);
    }

    // crossings -> runs: sort positions, diff, merge zero-runs
    std::vector<uint32_t> a;
    a.reserve(cx.size() + 1);
    for (size_t j = 0; j < cx.size(); ++j)
        a.push_back((uint32_t)(cx[j] * h + cy[j]));
    a.push_back((uint32_t)(h * w));
    std::sort(a.begin(), a.end());
    uint32_t p = 0;
    for (size_t j = 0; j < a.size(); ++j) {
        uint32_t t = a[j];
        a[j] -= p;
        p = t;
    }
    std::vector<uint32_t> b;
    b.reserve(a.size());
    size_t j = 0;
    b.push_back(a[j++]);
    while (j < a.size()) {
        if (a[j] > 0) {
            b.push_back(a[j++]);
        } else {
            ++j;
            if (j < a.size()) b.back() += a[j++];
        }
    }
    if ((int64_t)b.size() > max_counts) return -1;
    std::memcpy(counts_out, b.data(), b.size() * sizeof(uint32_t));
    return (int64_t)b.size();
}

}  // extern "C"
