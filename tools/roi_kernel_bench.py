"""Direct XLA-vs-Pallas RoIAlign microbenchmark at eval-path scale.

Times just the multiscale RoIAlign op (the 101 ms of the 161 ms round-3
eval forward) on random FPN features + a realistic box-size mixture, with
the chained data-dependent method (one final host read).

Usage: python tools/roi_kernel_bench.py [--batch 8] [--hw 832,1344]
                                        [--n 1000] [--iters 10]
                                        [--dtype float32|bfloat16]
Prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(b, h, w, n, dtype, seed=0):
    rng = np.random.RandomState(seed)
    c = 256
    feats = []
    fh, fw = h // 4, w // 4
    for _ in range(4):
        feats.append(jnp.asarray(
            rng.randn(b, fh, fw, c).astype(np.float32), dtype=dtype))
        fh, fw = fh // 2, fw // 2
    # realistic proposal mixture: mostly moderate aspect, a tail of
    # extreme tall/wide boxes exercising classes T and W
    cx = rng.uniform(0, w, (b, n))
    cy = rng.uniform(0, h, (b, n))
    scale = np.exp(rng.uniform(np.log(16), np.log(512), (b, n)))
    ar = np.exp(rng.randn(b, n) * 0.5)
    ext = rng.rand(b, n) < 0.02
    ar = np.where(ext, np.exp(np.sign(rng.randn(b, n)) * np.log(8.0)), ar)
    bw = scale * np.sqrt(ar)
    bh = scale / np.sqrt(ar)
    x1 = np.clip(cx - bw / 2, 0, w - 2)
    y1 = np.clip(cy - bh / 2, 0, h - 2)
    x2 = np.clip(x1 + bw, x1 + 1, w - 1)
    y2 = np.clip(y1 + bh, y1 + 1, h - 1)
    boxes = jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))
    return feats, boxes


def chain_time(name, fn, feats, boxes, iters):
    @jax.jit
    def chained(feats, boxes):
        s = jnp.float32(0.0)
        for _ in range(iters):
            bx = boxes + s * jnp.asarray(1e-30, boxes.dtype)
            out = fn(feats, bx)
            s = s + out.ravel()[0].astype(jnp.float32)
        return s

    float(chained(feats, boxes))  # compile + warm
    t0 = time.perf_counter()
    float(chained(feats, boxes))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"op": name, "ms": round(dt * 1000, 2)}), flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="832,1344")
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out_size", type=int, default=7)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))
    dtype = jnp.dtype(args.dtype)

    from hnd_ghnd_tpu.ops import pallas_roi, roi_align

    feats, boxes = make_inputs(args.batch, h, w, args.n, dtype)
    img = (h, w)
    P = args.out_size

    def xla_op(f, bx):
        return roi_align.multiscale_roi_align_batch(f, bx, img, P, 2)

    def pallas_op(f, bx):
        return pallas_roi.pallas_multiscale_roi_align_batch(f, bx, img, P, 2)

    # numeric sanity on the first call (outside timing) — the two ops run
    # in SEPARATE jit programs (fusing them into one doubles XLA's remat
    # footprint past HBM at n=1000x8), results stay on device, ONE scalar
    # crosses the tunnel
    r = jax.jit(lambda f, bx: xla_op(f, bx).astype(jnp.float32))(feats, boxes)
    g = jax.jit(lambda f, bx: pallas_op(f, bx).astype(jnp.float32))(feats, boxes)
    err = float(jax.jit(
        lambda r, g: jnp.max(jnp.abs(r - g)) / (jnp.max(jnp.abs(r)) + 1e-9)
    )(r, g))
    del r, g
    print(json.dumps({"parity_rel_err": err}), flush=True)

    chain_time("roi_align_xla", xla_op, feats, boxes, args.iters)
    chain_time("roi_align_pallas", pallas_op, feats, boxes, args.iters)


if __name__ == "__main__":
    main()
