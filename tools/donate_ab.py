"""A/B the GHND distill step with and without buffer donation (b24).

Round-5 follow-up: the product loop (donate=False, 98.9 img/s same-session
control) trails the donated 2-step unrolled chain (109.6 img/s on-chip).
steps_per_dispatch scan/unroll stacking was refuted (see BASELINE.md), so
the remaining candidate for the gap is donation: near the HBM edge,
input-output aliasing lets XLA update params/opt state in place instead of
allocating fresh buffers each step.

Method: both variants built in ONE process, interleaved runs (A, B, A, B),
python-loop chained dispatches with a single final scalar sync per run —
the same measurement bench.py uses for its loop number.

Usage: python tools/donate_ab.py [--batch 24] [--iters 30]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_distill_bench
    from hnd_ghnd_tpu.distill.box import DistillationBox
    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                            make_distill_train_step)

    # build_distill_bench gives the donate=False step + inputs; rebuild the
    # same box/optimizer for the donated twin
    step_nd, (t_params, t_state), (s_params, s_state, opt_state), batch, key \
        = build_distill_bench(batch_size=a.batch)
    from __graft_entry__ import _student_config, _teacher_config
    teacher = build_model(_teacher_config())
    student = build_model(_student_config())
    criterion = {
        "type": "general", "params": {"org_loss_factor": 0.0},
        "terms": {f"layer{i}": {
            "ts_modules": [f"backbone.body.layer{i}"] * 2,
            "criterion": {"type": "MSELoss", "params": {"reduction": "sum"}},
            "factor": 1.0} for i in (1, 2, 3, 4)},
    }
    frozen = ["backbone.body.layer2", "backbone.body.layer3",
              "backbone.body.layer4", "backbone.fpn", "rpn", "roi_heads"]
    box = DistillationBox(teacher, student, criterion)
    optimizer, _ = build_optimizer({"type": "Adam", "params": {"lr": 1e-3}})
    step_d = make_distill_train_step(box, optimizer, frozen,
                                     compute_dtype=jnp.bfloat16, donate=True)

    def run(step, tag, iters, sp, ss, os_):
        # fresh copies so donation never invalidates the master buffers
        sp, ss, os_ = jax.tree_util.tree_map(jnp.array, (sp, ss, os_))
        loss, _, sp, ss, os_ = step(t_params, t_state, sp, ss, os_, batch,
                                    key)
        float(loss)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, _, sp, ss, os_ = step(t_params, t_state, sp, ss, os_,
                                        batch, key)
        float(loss)
        dt = time.perf_counter() - t0
        return a.batch * iters / dt

    out = {}
    for rep in range(2):
        out[f"donate_img_s_r{rep}"] = round(
            run(step_d, "donate", a.iters, s_params, s_state, opt_state), 2)
        out[f"nodonate_img_s_r{rep}"] = round(
            run(step_nd, "nodonate", a.iters, s_params, s_state, opt_state),
            2)
    out["batch"] = a.batch
    out["iters"] = a.iters
    print(json.dumps(out))


if __name__ == "__main__":
    main()
