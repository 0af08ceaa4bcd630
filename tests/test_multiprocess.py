"""Multi-process (2-proc jax.distributed over CPU) eval parity.

The reference shards data with DistributedSampler and merges eval via pickle
all_gather (src/utils/misc_util.py:72-112, coco_eval_util.py:158-177).  Here
each process loads its shard (runners.common.loaders_from_config derives
shard identity from jax.process_index()) and
CocoEvaluator.synchronize_between_processes merges — this test requires the
merged 2-process stats to equal the single-process stats bit-for-bit.
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
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.models.factory import get_model


class A:  # the runner args surface consumed by maybe_init_distributed
    coordinator_address = None
    num_processes = None
    process_id = None


args = A()
if len(sys.argv) > 2:
    args.coordinator_address = sys.argv[2]
    args.num_processes = int(sys.argv[3])
    args.process_id = int(sys.argv[4])
multihost.maybe_init_distributed(args)

fixture_root = sys.argv[1]
img_dir, ann_file = make_coco_fixture(fixture_root, num_images=8, seed=7,
                                      num_classes=4)
split = {"images": img_dir, "annotations": ann_file,
         "remove_non_annotated_imgs": False, "jpeg_quality": None}
config = {
    "dataset": {"name": "tiny", "num_workers": 2,
                "splits": {"train": dict(split), "val": dict(split),
                           "test": dict(split)}},
    "tpu": {"buckets": [[96, 96]], "min_sizes": [64], "max_size": 96},
    "test": {"batch_size": 1},
}
model_cfg = {"name": "faster_rcnn",
             "backbone": {"name": "resnet50",
                          "params": {"pretrained": False}},
             "params": {"num_classes": 5, "pretrained": False}}
model, params, state = get_model(model_cfg, seed=3)
_, _, test_loader = common.loaders_from_config(config, model.kind, 1)
local_images = sum(1 for _ in test_loader)
ev = common.evaluate(model, params, state, test_loader)
out = {
    "rank": multihost.get_rank(),
    "world": multihost.get_world_size(),
    "local_batches": local_images,
    "merged_images": len(ev.evals["bbox"].img_ids),
    "merged_dets": int(sum(len(v) for v in ev.evals["bbox"].dts.values())),
    "stats": [float(x) for x in ev.evals["bbox"].stats],
    "precision_sum": float(ev.evals["bbox"].precision.sum()),
}
# bypass the multihost print patch (non-master prints are suppressed,
# reference main_util.py:29-40) so every rank reports its result
sys.stdout.write("RESULT " + json.dumps(out) + "\n")
sys.stdout.flush()
"""


def _run(extra_argv, env_extra, fixture_root):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", DRIVER, fixture_root] + extra_argv,
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _result(proc, timeout=540):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, err[-3000:]
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in output:\n{out[-2000:]}")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestTwoProcessEvalParity:
    def test_sharded_eval_merges_to_single_process_stats(self, tmp_path):
        single = _result(_run([], {}, str(tmp_path / "fix_single")))
        assert single["world"] == 1
        assert single["merged_images"] == 8

        port = _free_port()
        addr = f"127.0.0.1:{port}"
        fix2 = str(tmp_path / "fix_two")
        p0 = _run([addr, "2", "0"], {}, fix2 + "0")
        p1 = _run([addr, "2", "1"], {}, fix2 + "1")
        r0 = _result(p0)
        r1 = _result(p1)

        for r in (r0, r1):
            assert r["world"] == 2
            # each process evaluated only its shard...
            assert r["local_batches"] == 4
            # ...but after the merge holds the full image/prediction set
            assert r["merged_images"] == 8
            assert r["merged_dets"] == single["merged_dets"]
            # identical stats everywhere, bit-for-bit vs single-process
            np.testing.assert_array_equal(r["stats"], single["stats"])
            assert r["precision_sum"] == single["precision_sum"]


class TestMeshShardedEval:
    def test_batched_mesh_eval_matches_batch1(self, tmp_path):
        """Sharding eval batches over the data mesh must not change results:
        batch-4 eval on a 4-device mesh == batch-1 single-device eval."""
        import jax
        from tests.fixtures import make_coco_fixture
        from hnd_ghnd_tpu.models.factory import get_model
        from hnd_ghnd_tpu.parallel.mesh import make_mesh_for_batch
        from hnd_ghnd_tpu.runners import common

        img_dir, ann_file = make_coco_fixture(str(tmp_path), num_images=8,
                                              seed=7, num_classes=4)
        split = {"images": img_dir, "annotations": ann_file,
                 "remove_non_annotated_imgs": False, "jpeg_quality": None}
        config = {
            "dataset": {"name": "tiny", "num_workers": 2,
                        "splits": {"train": dict(split), "val": dict(split),
                                   "test": dict(split)}},
            "tpu": {"buckets": [[96, 96]], "min_sizes": [64], "max_size": 96},
            "test": {"batch_size": 1},
        }
        model_cfg = {"name": "faster_rcnn",
                     "backbone": {"name": "resnet50",
                                  "params": {"pretrained": False}},
                     "params": {"num_classes": 5, "pretrained": False}}
        model, params, state = get_model(model_cfg, seed=3)

        _, _, loader_b1 = common.loaders_from_config(config, model.kind, 1)
        ev1 = common.evaluate(model, params, state, loader_b1)

        config4 = dict(config, test={"batch_size": 4})
        _, _, loader_b4 = common.loaders_from_config(config4, model.kind, 1)
        mesh = make_mesh_for_batch(4, jax.devices())
        assert mesh.devices.size == 4
        ev4 = common.evaluate(model, params, state, loader_b4, mesh=mesh)

        np.testing.assert_allclose(ev4.evals["bbox"].stats,
                                   ev1.evals["bbox"].stats, atol=1e-6)
        assert (sum(len(v) for v in ev4.evals["bbox"].dts.values())
                == sum(len(v) for v in ev1.evals["bbox"].dts.values()))


EXT_DRIVER = r"""
import json, sys
import numpy as np
from tests.fixtures import make_coco_fixture
from hnd_ghnd_tpu.parallel import multihost
from hnd_ghnd_tpu.runners import common
from hnd_ghnd_tpu.runners import ext_runner
from hnd_ghnd_tpu.models.factory import get_model


class A:
    coordinator_address = None
    num_processes = None
    process_id = None


args = A()
if len(sys.argv) > 2:
    args.coordinator_address = sys.argv[2]
    args.num_processes = int(sys.argv[3])
    args.process_id = int(sys.argv[4])
multihost.maybe_init_distributed(args)

img_dir, ann_file = make_coco_fixture(sys.argv[1], num_images=8, seed=13,
                                      num_classes=4, empty_prob=0.4)
split = {"images": img_dir, "annotations": ann_file,
         "remove_non_annotated_imgs": False, "jpeg_quality": None}
config = {
    "dataset": {"name": "tiny", "num_workers": 2,
                "splits": {"train": dict(split), "val": dict(split),
                           "test": dict(split)}},
    "tpu": {"buckets": [[96, 96]], "min_sizes": [64], "max_size": 96},
    "test": {"batch_size": 1},
}
model_cfg = {
    "name": "faster_rcnn",
    "backbone": {"name": "custom_resnet50",
                 "params": {"pretrained": False,
                            "layer1": {"name": "Bottleneck4LargeResNet",
                                       "bottleneck_channel": 3}},
                 "ext_config": {"threshold": 0.01}},
    "params": {"num_classes": 5, "pretrained": False}}
model, params, state = get_model(model_cfg, seed=5)
_, _, test_loader = common.loaders_from_config(config, model.kind, 1)
local = sum(1 for _ in test_loader)
probs, labels = ext_runner.collect_probs(model, params, state, test_loader,
                                         keypoint_task=False)
out = {
    "rank": multihost.get_rank(),
    "world": multihost.get_world_size(),
    "local_batches": local,
    "n": int(len(probs)),
    "prob_sum": float(np.sort(probs).sum()),
    "labels_sorted": sorted(int(x) for x in labels),
}
sys.stdout.write("RESULT " + json.dumps(out) + "\n")
sys.stdout.flush()
"""


class TestTwoProcessExtEvalMerge:
    def test_ext_probs_merge_across_processes(self, tmp_path):
        """collect_probs must yield the FULL (probs, labels) set on every
        process (the reference evaluates the full val set on every rank),
        so ROC-AUC-driven checkpoint gating agrees everywhere."""
        import subprocess

        def run(extra_argv, fixture_root):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env.setdefault("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(REPO, ".jax_cache"))
            return subprocess.Popen(
                [sys.executable, "-c", EXT_DRIVER, fixture_root] + extra_argv,
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True)

        single = _result(run([], str(tmp_path / "fx_s")))
        assert single["world"] == 1 and single["n"] == 8

        port = _free_port()
        addr = f"127.0.0.1:{port}"
        p0 = run([addr, "2", "0"], str(tmp_path / "fx0"))
        p1 = run([addr, "2", "1"], str(tmp_path / "fx1"))
        r0 = _result(p0)
        r1 = _result(p1)
        for r in (r0, r1):
            assert r["world"] == 2
            assert r["local_batches"] == 4   # sharded eval...
            assert r["n"] == 8               # ...but merged result set
            assert r["labels_sorted"] == single["labels_sorted"]
            np.testing.assert_allclose(r["prob_sum"], single["prob_sum"],
                                       rtol=1e-5)


class TestShardedDetectionTrainStep:
    def test_ddp_parity_with_manual_two_shard_average(self):
        """The shard_map supervised train step == reference DDP semantics:
        per-shard losses (local normalization, fold_in(rng, shard) sampling)
        with pmean-averaged gradients feeding one optimizer update.  The
        expectation is computed manually shard-by-shard."""
        import jax
        import jax.numpy as jnp
        import optax
        from hnd_ghnd_tpu.models.factory import get_model
        from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                                images_to_compute,
                                                make_detection_train_step,
                                                make_mesh_for_batch,
                                                put_batch)

        model_cfg = {"name": "faster_rcnn",
                     "backbone": {"name": "resnet18",
                                  "params": {"pretrained": False}},
                     "params": {"num_classes": 5, "pretrained": False}}
        model, params, state = get_model(model_cfg, seed=0)
        opt, _ = build_optimizer(
            {"type": "SGD", "params": {"lr": 0.01, "momentum": 0.9}})
        opt_state = opt.init(params)

        b, h, w, g = 4, 96, 96, 3
        rnd = np.random.RandomState(0)
        images = jnp.asarray(rnd.rand(b, h, w, 3).astype(np.float32))
        sizes = jnp.asarray([[h, w]] * b, jnp.int32)
        batch = {"images": images, "image_sizes": sizes,
                 "original_sizes": sizes}
        x1 = rnd.uniform(0, 40, (b, g, 1))
        y1 = rnd.uniform(0, 40, (b, g, 1))
        wh = rnd.uniform(10, 40, (b, g, 2))
        boxes = np.concatenate(
            [x1, y1, x1 + wh[..., :1], y1 + wh[..., 1:]], -1)
        targets = {"boxes": jnp.asarray(boxes, jnp.float32),
                   "labels": jnp.ones((b, g), jnp.int32),
                   "boxes_valid": jnp.ones((b, g), bool)}
        rng = jax.random.PRNGKey(5)

        # ------------------------------------------ manual DDP expectation
        def local(shard):
            sl = slice(shard * 2, shard * 2 + 2)
            cb = {k: v[sl] for k, v in batch.items()}
            ct = {k: v[sl] for k, v in targets.items()}
            r = jax.random.fold_in(rng, shard)
            cb = dict(cb, images=images_to_compute(cb["images"],
                                                   jnp.float32))

            def loss_fn(p):
                losses, new_state, _ = model.forward(
                    p, state, cb, training=True, targets=ct, rng=r)
                return sum(losses.values()), (losses, new_state)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        (l0, _), g0 = local(0)
        (l1, _), g1 = local(1)
        grads = jax.tree_util.tree_map(lambda a, c: (a + c) / 2, g0, g1)
        updates, _ = opt.update(grads, opt_state, params)
        params_exp = optax.apply_updates(params, updates)
        loss_exp = float((l0 + l1) / 2)

        # ----------------------------------------------- shard_map actual
        mesh = make_mesh_for_batch(2, jax.devices()[:2])
        assert mesh.size == 2
        step = make_detection_train_step(model, opt, (), mesh=mesh,
                                         compute_dtype=jnp.float32)
        loss_s, _, params_s, _, _ = step(
            params, state, opt_state, put_batch(batch, mesh),
            put_batch(targets, mesh), rng)

        np.testing.assert_allclose(float(loss_s), loss_exp, rtol=1e-5)
        for a, e in zip(jax.tree_util.tree_leaves(params_s),
                        jax.tree_util.tree_leaves(params_exp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-5, atol=1e-6)

    def test_stacked_dispatch_matches_sequential_shard_map(self):
        """``tpu.steps_per_dispatch`` > 1 on the supervised shard_map path:
        one dispatch scans 2 microbatches ([2, B, ...] leaves sharded on
        dim 1) and must match two plain dispatches with the same keys."""
        import jax
        import jax.numpy as jnp
        from hnd_ghnd_tpu.models.factory import get_model
        from hnd_ghnd_tpu.parallel.mesh import (build_optimizer,
                                                make_detection_train_step,
                                                make_mesh_for_batch,
                                                put_batch, stack_microbatches)

        model_cfg = {"name": "faster_rcnn",
                     "backbone": {"name": "resnet18",
                                  "params": {"pretrained": False}},
                     "params": {"num_classes": 5, "pretrained": False}}
        model, params, state = get_model(model_cfg, seed=0)
        opt, _ = build_optimizer(
            {"type": "SGD", "params": {"lr": 0.01, "momentum": 0.9}})
        opt_state = opt.init(params)
        mesh = make_mesh_for_batch(2, jax.devices()[:2])
        assert mesh.size == 2

        b, h, w, g = 4, 96, 96, 3
        rnd = np.random.RandomState(7)

        def microbatch(seed):
            r = np.random.RandomState(seed)
            sizes = jnp.asarray([[h, w]] * b, jnp.int32)
            batch = {"images": jnp.asarray(
                         r.rand(b, h, w, 3).astype(np.float32)),
                     "image_sizes": sizes, "original_sizes": sizes}
            x1 = r.uniform(0, 40, (b, g, 1))
            y1 = r.uniform(0, 40, (b, g, 1))
            wh = r.uniform(10, 40, (b, g, 2))
            boxes = np.concatenate(
                [x1, y1, x1 + wh[..., :1], y1 + wh[..., 1:]], -1)
            targets = {"boxes": jnp.asarray(boxes, jnp.float32),
                       "labels": jnp.ones((b, g), jnp.int32),
                       "boxes_valid": jnp.ones((b, g), bool)}
            return batch, targets

        micro = [microbatch(s) for s in (1, 2)]
        keys = [jax.random.PRNGKey(21), jax.random.PRNGKey(22)]

        step1 = make_detection_train_step(model, opt, (), mesh=mesh,
                                          compute_dtype=jnp.float32)
        # the step donates (params, state, opt_state): give the sequential
        # pass its own copies so step2 can reuse the originals
        p, s, o = jax.tree_util.tree_map(jnp.array,
                                         (params, state, opt_state))
        seq_losses = []
        for (mb, mt), k in zip(micro, keys):
            loss, _, p, s, o = step1(p, s, o, put_batch(mb, mesh),
                                     put_batch(mt, mesh), k)
            seq_losses.append(float(loss))

        step2 = make_detection_train_step(model, opt, (), mesh=mesh,
                                          compute_dtype=jnp.float32,
                                          steps_per_dispatch=2)
        sb = put_batch(stack_microbatches([m[0] for m in micro]), mesh, 1)
        st = put_batch(stack_microbatches([m[1] for m in micro]), mesh, 1)
        losses, loss_dicts, p2, s2, o2 = step2(
            params, state, opt_state, sb, st, jnp.stack(keys))

        assert np.asarray(losses).shape == (2,)
        np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
        for a, e in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-6, atol=1e-7)
