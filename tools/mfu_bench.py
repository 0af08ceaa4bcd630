"""Step MFU measurement + the cheap XLA/stem experiments (VERDICT r3 #8).

Measures the headline GHND distill step's FLOP/s against the v5e bf16 peak
and gives the experiment harness for the zero-effort levers round 3 left
unrun:

* XLA scheduling/fusion flags — run this script under different XLA_FLAGS
  (flags must be set before backend init, hence per-process):
      XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
          python tools/mfu_bench.py
* stem input-channel padding (--stem_pad): times conv1 7x7/s2 with the
  native Cin=3 vs zero-padded Cin=8 in isolation — if the padded conv is
  materially faster, plumb the padding into the model stem.

FLOPs come from XLA's own cost analysis of the compiled step executable,
so the MFU denominator is exact for the program as compiled.

Prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # per chip (public v5e spec)


def chained_seconds(fn, args0, iters, carry_fn):
    """fn compiled; run iters chained applications, one final sync."""
    import jax
    state = args0
    out = fn(*state)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])  # compile+warm
    state = carry_fn(state, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*state)
        state = carry_fn(state, out)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def step_mfu(iters: int):
    import jax

    from bench import BATCH, build_distill_bench

    step, (tp, ts), (sp, ss, os_), batch, key = build_distill_bench()

    # FLOPs of the compiled step from XLA's cost analysis
    lowered = jax.jit(step).lower(tp, ts, sp, ss, os_, batch, key)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    # chained timing (bench.py's measurement, shared code path)
    state = (sp, ss, os_)
    loss = None
    t0 = None
    sp2, ss2, os2 = sp, ss, os_
    for i in range(3):
        loss, _, sp2, ss2, os2 = step(tp, ts, sp2, ss2, os2, batch, key)
        float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        loss, _, sp2, ss2, os2 = step(tp, ts, sp2, ss2, os2, batch, key)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    tflops_s = flops / dt / 1e12
    print(json.dumps({
        "metric": "ghnd_step_mfu",
        "img_s": round(BATCH / dt, 2),
        "step_ms": round(dt * 1000, 1),
        "flops_per_step_g": round(flops / 1e9, 1),
        "tflops_s": round(tflops_s, 1),
        "mfu_pct_v5e_bf16": round(100 * tflops_s / V5E_BF16_PEAK_TFLOPS, 1),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
    }), flush=True)


def stem_pad_experiment(iters: int):
    """conv1 7x7/s2 Cin=3 vs zero-padded Cin=8, batch 24 832x1344 bf16."""
    import jax
    import jax.numpy as jnp

    b, h, w = 24, 832, 1344
    key = jax.random.PRNGKey(0)
    for cin in (3, 8):
        x = jax.random.uniform(key, (b, h, w, cin), jnp.bfloat16)
        wgt = jax.random.normal(jax.random.PRNGKey(1), (7, 7, cin, 64),
                                jnp.bfloat16)
        if cin == 8:  # channels 3.. are zero on both sides (same math)
            x = x.at[..., 3:].set(0)
            wgt = wgt.at[:, :, 3:, :].set(0)

        @jax.jit
        def conv(x, wgt):
            y = jax.lax.conv_general_dilated(
                x, wgt, window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0)

        @jax.jit
        def chain(x, wgt):
            s = jnp.bfloat16(0.0)
            y = None
            for _ in range(iters):
                y = conv(x + s * jnp.bfloat16(1e-6), wgt)
                s = s + y.ravel()[0]
            return s

        float(chain(x, wgt))
        t0 = time.perf_counter()
        float(chain(x, wgt))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"stage": f"stem_conv_cin{cin}",
                          "ms": round(dt * 1000, 2)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stem_pad", action="store_true")
    args = ap.parse_args()
    if args.stem_pad:
        stem_pad_experiment(args.iters)
    else:
        step_mfu(args.iters)


if __name__ == "__main__":
    main()
