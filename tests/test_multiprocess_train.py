"""Multi-process (2-proc jax.distributed over CPU) TRAINING parity.

The reference's default mode is multi-process DDP distillation
(src/mimic_runner.py:143, src/utils/main_util.py:43-62).  The TPU-native
analog is a global mesh spanning both processes: each process loads its
shard (the DistributedSampler analog), put_batch assembles the global batch
via make_array_from_process_local_data, and the gradient psum crosses
processes inside the jitted step.  This test drives the REAL
mimic_runner.distill() loop under 2 processes and asserts:

  * both processes observe the same global loss sequence;
  * the loss sequence and final parameters match a single-process run of
    the same global batches on a same-shape 4-device mesh;
  * the in-loop evaluation (sharded val + merge) agrees across processes.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.rendezvous]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, sys
import numpy as np
from tests.fixtures import make_coco_fixture
from hnd_ghnd_tpu.parallel import multihost

mode = sys.argv[1]          # "multi" | "single"
fixture_root = sys.argv[2]


class A:  # the runner args surface consumed by distill()
    coordinator_address = None
    num_processes = None
    process_id = None
    seed = 3
    transform_bottleneck = False
    profile_dir = None
    tb_dir = None


args = A()
if mode == "multi":
    args.coordinator_address = sys.argv[3]
    args.num_processes = int(sys.argv[4])
    args.process_id = int(sys.argv[5])
multihost.maybe_init_distributed(args)

import jax
import jax.numpy as jnp
from hnd_ghnd_tpu.distill.box import DistillationBox
from hnd_ghnd_tpu.models.factory import get_model
from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, make_mesh_for_batch,
                                        make_distill_train_step, put_batch,
                                        replicate)
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.runners import mimic_runner

img_dir, ann_file = make_coco_fixture(fixture_root, num_images=8, seed=11,
                                      num_classes=4)
split = {"images": img_dir, "annotations": ann_file,
         "remove_non_annotated_imgs": False, "jpeg_quality": None}
config = {
    "dataset": {"name": "tiny", "num_workers": 2,
                "splits": {"train": dict(split), "val": dict(split),
                           "test": dict(split)}},
    "tpu": {"buckets": [[64, 64]], "min_sizes": [64], "max_size": 64,
            "compute_dtype": "float32"},
    "test": {"batch_size": 1},
    "teacher_model": {
        "name": "faster_rcnn",
        "backbone": {"name": "resnet50", "params": {"pretrained": False}},
        "params": {"num_classes": 5, "pretrained": False}},
    "student_model": {
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}}},
        "params": {"num_classes": 5, "pretrained": False},
        "frozen_modules": ["backbone.body.layer2", "backbone.body.layer3",
                           "backbone.body.layer4", "backbone.fpn", "rpn",
                           "roi_heads"]},
    "train": {
        "batch_size": 2,     # per process; global batch 4
        "num_epochs": 2,
        "log_freq": 1000,
        "optimizer": {"type": "Adam", "params": {"lr": 1e-3}},
        "criterion": {
            "type": "general", "params": {"org_loss_factor": 0.0},
            "terms": {"layer1": {
                "ts_modules": ["backbone.body.layer1"] * 2,
                "criterion": {"type": "MSELoss",
                              "params": {"reduction": "sum"}},
                "factor": 1.0}}},
    },
}

teacher, t_params, t_state = get_model(config["teacher_model"], seed=args.seed)
student, s_params, s_state = get_model(config["student_model"],
                                       seed=args.seed + 1)

losses = []
val_stats = []

if mode == "multi":
    # record every delayed-fetch loss read from the real distill() loop
    orig_read = common.StepMetrics._read_one

    def recording_read(self):
        entries = orig_read(self)
        losses.extend((e[0], e[1]) for e in entries)
        return entries

    common.StepMetrics._read_one = recording_read

    orig_eval = common.evaluate

    def recording_eval(*a, **k):
        ev = orig_eval(*a, **k)
        val_stats.append([float(x) for x in ev.evals["bbox"].stats])
        return ev

    common.evaluate = recording_eval
    mimic_runner.common.evaluate = recording_eval

    global_batch = int(config["train"]["batch_size"]) * jax.process_count()
    mesh = make_mesh_for_batch(global_batch, jax.devices())
    assert mesh.devices.size == 4, mesh
    s_params_out, _ = mimic_runner.distill(
        (teacher, t_params, t_state), (student, s_params, s_state),
        config, args, mesh)
else:
    # single-process reference: the SAME global batches (concat of the two
    # shard loaders, matching make_array_from_process_local_data's
    # process-major row order) through the same step on a same-shape
    # 4-device single-process mesh
    train_cfg = config["train"]
    loaders = [common.loaders_from_config(
        config, student.kind, int(train_cfg["batch_size"]),
        min_sizes=(800,), shard_index=p, num_shards=2)[0]
        for p in range(2)]
    steps_per_epoch = max(len(loaders[0]), 1)
    warmup = min(1000, steps_per_epoch - 1)
    optimizer, _ = build_optimizer(train_cfg["optimizer"], None,
                                   steps_per_epoch, warmup)
    box = DistillationBox(teacher, student, train_cfg["criterion"])
    mesh = make_mesh_for_batch(4, jax.devices())
    assert mesh.devices.size == 4, mesh
    step = make_distill_train_step(
        box, optimizer, config["student_model"]["frozen_modules"],
        mesh=mesh, donate=False,
        compute_dtype=common.compute_dtype_from_config(config))
    opt_state = optimizer.init(s_params)
    t_params, t_state, s_params, s_state, opt_state = (
        replicate(x, mesh)
        for x in (t_params, t_state, s_params, s_state, opt_state))
    rng = jax.random.PRNGKey(args.seed)
    idx = 0
    for epoch in range(int(train_cfg["num_epochs"])):
        for ld in loaders:
            ld.set_epoch(epoch)
        for (b0, _, _), (b1, _, _) in zip(*loaders):
            rng, key = jax.random.split(rng)
            batch = {k: np.concatenate([np.asarray(b0[k]), np.asarray(b1[k])])
                     for k in b0}
            loss, _, s_params, s_state, opt_state = step(
                t_params, t_state, s_params, s_state, opt_state,
                put_batch({k: jnp.asarray(v) for k, v in batch.items()},
                          mesh), key)
            idx += 1
            losses.append((idx, float(loss)))
    s_params_out = s_params

checksum = float(sum(np.abs(np.asarray(x, np.float64)).sum()
                     for x in jax.tree_util.tree_leaves(s_params_out)))
out = {
    "mode": mode,
    "rank": multihost.get_rank(),
    "world": multihost.get_world_size(),
    "losses": sorted(losses),
    "val_stats": val_stats,
    "params_checksum": checksum,
}
sys.stdout.write("RESULT " + json.dumps(out) + "\n")
sys.stdout.flush()
"""


def _run(mode, extra_argv, fixture_root, n_local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f"--xla_force_host_platform_device_count={n_local_devices}",
             # the jitted step psums across every device; on a loaded
             # single-core host the pre-collective sections can serialize
             # past XLA-CPU's default 40 s rendezvous abort
             "--xla_cpu_collective_timeout_seconds=600",
             "--xla_cpu_collective_call_terminate_timeout_seconds=1200"]
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    return subprocess.Popen(
        [sys.executable, "-c", DRIVER, mode, fixture_root] + extra_argv,
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _result(proc, timeout=1700):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, err[-4000:]
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in output:\n{out[-2000:]}")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestTwoProcessTrainParity:
    def test_distill_matches_single_process_global_batch(self, tmp_path):
        port = _free_port()
        addr = f"127.0.0.1:{port}"
        fix = str(tmp_path / "fix")
        p0 = _run("multi", [addr, "2", "0"], fix + "0", 2)
        p1 = _run("multi", [addr, "2", "1"], fix + "1", 2)
        r0 = _result(p0)
        r1 = _result(p1)

        for r in (r0, r1):
            assert r["world"] == 2
            # 2 epochs x (4 local imgs / batch 2) = 4 steps observed
            assert len(r["losses"]) == 4
        # the loss is a global psum: every process reads the same value
        np.testing.assert_allclose([l for _, l in r0["losses"]],
                                   [l for _, l in r1["losses"]], rtol=1e-6)
        # the merged in-loop eval agrees bit-for-bit across processes
        assert r0["val_stats"] == r1["val_stats"]
        assert len(r0["val_stats"]) == 2  # one eval per epoch

        single = _result(_run("single", [], str(tmp_path / "fix_s"), 4))
        assert single["world"] == 1
        # same global batches, same mesh shape => same training trajectory
        # (cross-process Gloo reduction order may differ from the
        # intra-process collective by float rounding)
        np.testing.assert_allclose([l for _, l in r0["losses"]],
                                   [l for _, l in single["losses"]],
                                   rtol=1e-4)
        np.testing.assert_allclose(r0["params_checksum"],
                                   single["params_checksum"], rtol=1e-5)
