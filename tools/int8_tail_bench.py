"""Batched int8-vs-fp server-tail A/B on the attached chip (VERDICT r3 #3).

Round 3's only int8 latency number was batch-1 fixture latency through the
per-image wire protocol — tunnel-dominated, so it said nothing about the
s8 x s8 -> s32 trunk win.  This tool measures the TAIL-ONLY jitted
programs (fp SplitRCNN.tail vs Int8SplitTail.tail) at serving batch and
real bucket with the chained data-dependent method (one final sync), which
the tunnel cannot pollute.

Everything is generated on device: random images -> edge head -> wire
tensor (the tails consume identical wire inputs).  Calibration runs on a
couple of random batches — accuracy is NOT measured here (the trained
fixture A/B in cost_analyzer --int8_tail covers the mAP delta: -0.0012).

Usage: python tools/int8_tail_bench.py [--batch 8] [--hw 832,1344]
                                       [--iters 10]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="832,1344")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))
    b = args.batch

    import __graft_entry__ as ge
    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.split import int8 as qi
    from hnd_ghnd_tpu.split.deploy import SplitRCNN

    model = build_model(ge._student_config())
    params, state = model.init(jax.random.PRNGKey(0))

    split = SplitRCNN(model, 8)
    head_jit, tail_call, _ = split.build(params, state)

    images = jax.random.uniform(jax.random.PRNGKey(7), (b, h, w, 3),
                                jnp.float32)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)
    q, scale, zp, _ = head_jit(images)
    q = jax.block_until_ready(q)
    print(json.dumps({"wire_shape": list(q.shape),
                      "wire_dtype": str(q.dtype)}), flush=True)

    # calibrate the int8 tail on the dequantized wire (device->host fetch
    # of the small bottleneck tensor is fine: bch=3 at stride 4)
    from hnd_ghnd_tpu.codec.quantizer import QuantizedTensor, dequantize_tensor
    z = np.asarray(dequantize_tensor(QuantizedTensor(q, scale, zp)))
    scales = qi.calibrate_tail(model, params, state, [z])
    int8_tail = qi.Int8SplitTail(model, params, state, scales)
    int8_call = int8_tail.build()

    def chain_time(name, call):
        sc = jnp.float32(scale)

        def run():
            s = jnp.float32(0.0)
            out = None
            t0 = None
            for _ in range(args.iters):
                dets = call(q, sc + s * jnp.float32(1e-30), zp, sizes,
                            (h, w))
                s = s + dets["scores"].ravel()[0]
            return s
        float(run())  # compile + warm every per-bucket cache entry
        t0 = time.perf_counter()
        float(run())
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1000, 2),
                          "img_s": round(b / dt, 1)}), flush=True)
        return dt

    t_fp = chain_time("fp_tail", tail_call)
    t_q = chain_time("int8_tail", int8_call)
    print(json.dumps({
        "metric": "int8_tail_speedup_batch%d" % b,
        "fp_ms": round(t_fp * 1000, 2),
        "int8_ms": round(t_q * 1000, 2),
        "speedup_pct": round(100 * (t_fp - t_q) / t_fp, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
