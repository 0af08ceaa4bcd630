"""Multi-device SERVING dryrun (VERDICT r4 #4 / ROADMAP #13).

Exports the bottleneck student's serving TAIL over an n-device mesh
(shard_map data-axis program, per-edge quantization scales), serializes it,
reloads it WITHOUT model code, executes it on the n-virtual-CPU-device mesh,
and checks every shard against the single-device tail oracle — the serving
counterpart of `__graft_entry__.dryrun_multichip` (which proves the training
path).  Writes SHARDEDSERVE.json with the verdict.

Reference deployment boundary: /root/reference/src/models/mimic/split_rcnn.py
:215-221 (head/tail split); this proves the tail half survives a multi-chip
topology.

Usage: python tools/sharded_tail_dryrun.py [--n 8] [--out SHARDEDSERVE.json]
(self-pins to a CPU backend with n virtual devices; safe to run as-is).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(n: int, out: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hnd_ghnd_tpu.models.factory import build_model
    from hnd_ghnd_tpu.parallel.mesh import make_mesh
    from hnd_ghnd_tpu.split.deploy import SplitRCNN
    from hnd_ghnd_tpu.split.export import export_sharded_tail, load_exported
    import __graft_entry__ as ge

    bucket = (128, 192)
    model = build_model(ge._student_config())
    params, state = model.init(jax.random.PRNGKey(0))

    devices = jax.devices("cpu")[:n]
    mesh = make_mesh(devices)
    blob = export_sharded_tail(model, params, state, bucket, mesh,
                               batch_per_shard=1, quant_bits=8)
    loaded = load_exported(blob)

    split = SplitRCNN(model, 8)
    head_jit, tail_call, _ = split.build(params, state)
    rng = np.random.RandomState(7)
    sizes = jnp.asarray([[bucket[0] - 16, bucket[1] - 32]], jnp.int32)
    qs, ss, zps, szs, oracle = [], [], [], [], []
    for _ in range(n):
        images = jnp.asarray(
            rng.rand(1, bucket[0], bucket[1], 3).astype(np.float32))
        q, s, zp, _ = head_jit(images)
        want = tail_call(q, s, zp, sizes, bucket)
        qs.append(np.asarray(q))
        ss.append(float(s))
        zps.append(float(zp))
        szs.append(np.asarray(sizes))
        oracle.append({k: np.asarray(v) for k, v in want.items()})

    got = loaded.call(mesh, np.concatenate(qs), np.asarray(ss, np.float32),
                      np.asarray(zps, np.float32), np.concatenate(szs))
    got = {k: np.asarray(v) for k, v in got.items()}

    max_box = max(float(np.max(np.abs(
        got["boxes"][i] - oracle[i]["boxes"][0]))) for i in range(n))
    max_score = max(float(np.max(np.abs(
        got["scores"][i] - oracle[i]["scores"][0]))) for i in range(n))
    labels_equal = all(bool(np.array_equal(
        got["labels"][i], oracle[i]["labels"][0])) for i in range(n))
    ok = max_box < 1e-2 and max_score < 1e-3 and labels_equal

    rec = {"ok": ok, "n_devices": n, "bucket_hw": list(bucket),
           "quant_bits": 8, "artifact_mb": round(len(blob) / 1e6, 1),
           "per_shard_scales": [round(s, 6) for s in ss],
           "max_abs_box_diff_vs_single_device_oracle": max_box,
           "max_abs_score_diff": max_score, "labels_equal": labels_equal,
           "backend": jax.devices()[0].platform}
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    if not ok:
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "SHARDEDSERVE.json"))
    args = ap.parse_args()

    if os.environ.get("_SHARDED_DRYRUN_SUBPROCESS") != "1":
        # self-pin: this container's default backend is a single tunneled
        # TPU; the dryrun is about multi-device semantics, so re-exec into
        # a clean CPU process with n virtual devices (the
        # __graft_entry__._dryrun_in_subprocess pattern).
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["_SHARDED_DRYRUN_SUBPROCESS"] = "1"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={args.n}")
        env["XLA_FLAGS"] = " ".join(flags)
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, ".jax_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
        sys.exit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--n", str(args.n),
             "--out", args.out], env=env, cwd=REPO).returncode)

    run(args.n, args.out)


if __name__ == "__main__":
    main()
