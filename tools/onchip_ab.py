"""Is bench.py's `onchip_step_img_s` real or a CSE artifact?

bench.py's 2-steps-per-dispatch chain reuses ONE batch for both inner
steps.  The GHND teacher forward is a pure function of (t_params, batch):
with identical inputs in one unrolled program, XLA may CSE it and compute
the teacher ONCE for two optimizer steps — inflating the "on-chip" rate by
up to the teacher-forward share of the step.  A/B in one process:

  A: unrolled-2 chain, SAME batch both steps  (bench.py's formulation)
  B: unrolled-2 chain, two DISTINCT batches   (what a real loop computes)

If B lands at the python-loop rate (~98 img/s at b24), the loop is already
at the chip's speed and the 109.6 claim needs an erratum.

Usage: python tools/onchip_ab.py [--batch 24] [--iters 16]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=16)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_distill_bench

    step, (t_params, t_state), (s_params, s_state, opt_state), batch, key = \
        build_distill_bench(batch_size=a.batch)

    # second, distinct batch (on-device perturbation — no H2D)
    batch2 = dict(batch, images=jnp.clip(
        batch["images"] + jax.random.uniform(
            jax.random.PRNGKey(9), batch["images"].shape, jnp.float32,
            -0.01, 0.01), 0.0, 1.0))
    jax.block_until_ready(batch2["images"])

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def same2(tp, ts, sp, ss, os_, b, k):
        l1, _, sp, ss, os_ = step(tp, ts, sp, ss, os_, b, k)
        l2, _, sp, ss, os_ = step(tp, ts, sp, ss, os_, b, k)
        return l1 + l2, sp, ss, os_

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def diff2(tp, ts, sp, ss, os_, ba, bb, k):
        l1, _, sp, ss, os_ = step(tp, ts, sp, ss, os_, ba, k)
        l2, _, sp, ss, os_ = step(tp, ts, sp, ss, os_, bb, k)
        return l1 + l2, sp, ss, os_

    def run(fn, args_fn, iters):
        sp, ss, os_ = jax.tree_util.tree_map(
            jnp.array, (s_params, s_state, opt_state))
        tot, sp, ss, os_ = fn(*args_fn(sp, ss, os_))
        float(tot)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            tot, sp, ss, os_ = fn(*args_fn(sp, ss, os_))
        float(tot)
        dt = time.perf_counter() - t0
        return a.batch * 2 * iters / dt

    out = {}
    for rep in range(2):
        out[f"same_batch_img_s_r{rep}"] = round(run(
            same2, lambda sp, ss, os_: (t_params, t_state, sp, ss, os_,
                                        batch, key), a.iters), 2)
        out[f"diff_batch_img_s_r{rep}"] = round(run(
            diff2, lambda sp, ss, os_: (t_params, t_state, sp, ss, os_,
                                        batch, batch2, key), a.iters), 2)
    out["batch"] = a.batch
    out["iters"] = a.iters
    print(json.dumps(out))


if __name__ == "__main__":
    main()
