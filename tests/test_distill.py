import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.distill.box import DistillationBox
from hnd_ghnd_tpu.distill.losses import get_loss
from hnd_ghnd_tpu.models.factory import build_model
from hnd_ghnd_tpu.parallel.mesh import (build_optimizer, make_mesh,
                                        make_distill_train_step, put_batch,
                                        replicate)
from hnd_ghnd_tpu.utils.params import (count_params, trainable_mask,
                                       updatable_param_names)

BUCKET = (192, 256)

FROZEN = ["backbone.body.layer2", "backbone.body.layer3",
          "backbone.body.layer4", "backbone.fpn", "rpn", "roi_heads"]


def criterion_cfg(layers):
    return {
        "type": "general",
        "params": {"org_loss_factor": 0.0},
        "terms": {
            f"layer{i}": {
                "ts_modules": [f"backbone.body.layer{i}"] * 2,
                "criterion": {"type": "MSELoss", "params": {"reduction": "sum"}},
                "factor": 1.0,
            } for i in layers
        },
    }


def make_batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    h, w = BUCKET
    return {
        "images": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "image_sizes": jnp.asarray([[h, w]] * b, dtype=jnp.int32),
        "original_sizes": jnp.asarray([[h, w]] * b, dtype=jnp.int32),
    }


@pytest.fixture(scope="module")
def models():
    teacher = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "resnet50", "params": {"pretrained": False,
                                                    "freeze_layers": True}},
        "params": {"num_classes": 91},
    })
    student = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False, "freeze_layers": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}}},
        "params": {"num_classes": 91},
    })
    t_params, t_state = teacher.init(jax.random.PRNGKey(0))
    s_params, s_state = student.init(jax.random.PRNGKey(1))
    # make the student trunk share the teacher's (frozen copies, as the
    # reference's pretrained+frozen_modules config arranges)
    for k in ("layer2", "layer3", "layer4"):
        s_params["backbone"]["body"][k] = t_params["backbone"]["body"][k]
    return teacher, t_params, t_state, student, s_params, s_state


class TestCriterion:
    def test_ghnd_is_sum_of_term_mses(self):
        crit = get_loss(criterion_cfg([1, 2, 3, 4]))
        t = {f"layer{i}": (jnp.ones((2, 4)), jnp.zeros((2, 4))) for i in (1, 2, 3, 4)}
        total, terms = crit({k: v for k, v in t.items()})
        assert total == pytest.approx(4 * 8.0)
        assert len(terms) == 4

    def test_org_loss_factor_zero_skips_task_loss(self):
        crit = get_loss(criterion_cfg([1]))
        total, _ = crit({"layer1": (jnp.ones((2,)), jnp.zeros((2,)))},
                        {"bogus": jnp.asarray(123.0)})
        assert total == pytest.approx(2.0)

    def test_hnd_truncates_backbone(self, models):
        teacher, *_ , student, _, _ = models[0], models[1], models[2], models[3], models[4], models[5]
        box_hnd = DistillationBox(models[0], models[3], criterion_cfg([1]))
        box_ghnd = DistillationBox(models[0], models[3], criterion_cfg([1, 2, 3, 4]))
        assert box_hnd.upto == 1
        assert box_ghnd.upto == 4


class TestTrainStep:
    def test_ghnd_step_runs_and_freezes(self, models):
        teacher, t_params, t_state, student, s_params, s_state = models
        box = DistillationBox(teacher, student, criterion_cfg([1, 2, 3, 4]))
        optimizer, _ = build_optimizer({"type": "Adam", "params": {"lr": 1e-3}})
        mesh = make_mesh()
        assert mesh.devices.size == 8
        step = make_distill_train_step(box, optimizer, FROZEN, mesh=mesh,
                                       compute_dtype=jnp.float32, donate=False)
        opt_state = optimizer.init(s_params)

        t_params_r = replicate(t_params, mesh)
        t_state_r = replicate(t_state, mesh)
        s_params_r = replicate(s_params, mesh)
        s_state_r = replicate(s_state, mesh)
        opt_state_r = replicate(opt_state, mesh)
        batch = put_batch(make_batch(b=8), mesh)

        losses = []
        sp, ss, os_ = s_params_r, s_state_r, opt_state_r
        for i in range(4):
            loss, loss_dict, sp, ss, os_ = step(
                t_params_r, t_state_r, sp, ss, os_, batch,
                jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

        # frozen trunk unchanged; bottleneck updated
        for k in ("layer2", "layer3", "layer4"):
            np.testing.assert_array_equal(
                np.asarray(sp["backbone"]["body"][k]["0"]["conv1"]["w"]),
                np.asarray(s_params["backbone"]["body"][k]["0"]["conv1"]["w"]))
        enc_old = np.asarray(
            s_params["backbone"]["body"]["layer1"]["encoder"]["conv0"]["w"])
        enc_new = np.asarray(
            sp["backbone"]["body"]["layer1"]["encoder"]["conv0"]["w"])
        assert np.abs(enc_new - enc_old).max() > 0

        # BN running stats advanced
        bn_old = np.asarray(
            s_state["backbone"]["body"]["layer1"]["encoder"]["bn0"]["mean"])
        bn_new = np.asarray(
            ss["backbone"]["body"]["layer1"]["encoder"]["bn0"]["mean"])
        assert np.abs(bn_new - bn_old).max() > 0


class TestStackedDispatch:
    """``tpu.steps_per_dispatch`` > 1: one jitted dispatch scans N optimizer
    steps over stacked microbatches (mesh.make_distill_train_step).  The
    update sequence must match N plain dispatches with the same keys — the
    runner's epoch-end remainder path dispatches through the spd=1 step, so
    the two must be interchangeable mid-stream."""

    def test_stacked_matches_sequential_on_mesh(self, models):
        from hnd_ghnd_tpu.parallel.mesh import stack_microbatches
        teacher, t_params, t_state, student, s_params, s_state = models
        # mean-reduced MSE + SGD, not the shipped sum+Adam: the scanned and
        # plain steps are separately-compiled XLA programs whose reductions
        # may reassociate at fp32 noise level.  The sum-reduced objective
        # has O(1e4) gradients (updates of ~1e2/step) that amplify that
        # noise to ~1e-3 by step 2, and Adam's first updates are
        # ~lr*sign(g); with O(1) gradients and a linear optimizer, genuine
        # sequencing parity shows up at tight tolerance.
        cfg = criterion_cfg([1])
        cfg["terms"]["layer1"]["criterion"]["params"]["reduction"] = "mean"
        box = DistillationBox(teacher, student, cfg)
        optimizer, _ = build_optimizer({"type": "SGD",
                                        "params": {"lr": 0.01,
                                                   "momentum": 0.9}})
        mesh = make_mesh()
        assert mesh.devices.size == 8
        opt_state = optimizer.init(s_params)
        step1 = make_distill_train_step(box, optimizer, FROZEN, mesh=mesh,
                                        compute_dtype=jnp.float32,
                                        donate=False)
        step2 = make_distill_train_step(box, optimizer, FROZEN, mesh=mesh,
                                        compute_dtype=jnp.float32,
                                        donate=False, steps_per_dispatch=2)

        def small_batch(seed, b=8, h=96, w=96):
            r = np.random.RandomState(seed)
            return {
                "images": jnp.asarray(r.rand(b, h, w, 3).astype(np.float32)),
                "image_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
                "original_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
            }

        batches = [small_batch(s) for s in (0, 1)]
        keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(12)]
        t_p, t_s = replicate(t_params, mesh), replicate(t_state, mesh)

        # sequential expectation: two spd=1 dispatches
        sp, ss, os_ = (replicate(s_params, mesh), replicate(s_state, mesh),
                       replicate(opt_state, mesh))
        seq_losses = []
        for b, k in zip(batches, keys):
            loss, _, sp, ss, os_ = step1(t_p, t_s, sp, ss, os_,
                                         put_batch(b, mesh), k)
            seq_losses.append(float(loss))

        # one stacked dispatch: leaves [2, 8, ...] sharded on dim 1
        stacked = put_batch(stack_microbatches(batches), mesh, batch_dim=1)
        losses, loss_dicts, sp2, ss2, os2 = step2(
            t_p, t_s, replicate(s_params, mesh), replicate(s_state, mesh),
            replicate(opt_state, mesh), stacked, jnp.stack(keys))

        assert np.asarray(losses).shape == (2,)
        assert np.asarray(loss_dicts["layer1"]).shape == (2,)
        np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
        for a, e in zip(jax.tree_util.tree_leaves(sp2),
                        jax.tree_util.tree_leaves(sp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-6, atol=1e-6)
        for a, e in zip(jax.tree_util.tree_leaves(ss2),
                        jax.tree_util.tree_leaves(ss)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-6, atol=1e-6)


class TestOrgLossDistill:
    """criterion.org_loss_factor != 0: the reference adds factor x sum(task
    losses) from a student forward WITH targets (src/distillation/loss.py:
    31-34; tool.py:49-58).  The step grows a targets argument and, on a
    multi-device mesh, runs under shard_map with reference-DDP semantics
    (the student's training forward pools RoIs through a pallas_call that
    GSPMD cannot partition)."""

    def _targets(self, b, g=3, seed=3):
        rng = np.random.RandomState(seed)
        x1 = rng.uniform(0, 40, (b, g, 1))
        y1 = rng.uniform(0, 40, (b, g, 1))
        wh = rng.uniform(10, 40, (b, g, 2))
        boxes = np.concatenate([x1, y1, x1 + wh[..., :1], y1 + wh[..., 1:]],
                               -1)
        return {"boxes": jnp.asarray(boxes, jnp.float32),
                "labels": jnp.ones((b, g), jnp.int32),
                "boxes_valid": jnp.ones((b, g), bool)}

    def test_ghnd_plus_task_loss_trains_on_8dev_mesh(self, models):
        # the Large bottleneck decoder emits 256 channels, so only the
        # resnet50 trunk fits (reference resnet_layer.py:52-65 + the
        # Small-name->Large factory quirk) — reuse the module fixture
        teacher, t_params, t_state, student, s_params, s_state = models
        cfg = criterion_cfg([1, 2, 3, 4])
        cfg["params"]["org_loss_factor"] = 0.5
        box = DistillationBox(teacher, student, cfg)
        assert box.use_org_loss

        optimizer, _ = build_optimizer({"type": "Adam", "params": {"lr": 1e-3}})
        mesh = make_mesh()
        assert mesh.devices.size == 8
        step = make_distill_train_step(box, optimizer, FROZEN, mesh=mesh,
                                       compute_dtype=jnp.float32,
                                       donate=False)
        opt_state = optimizer.init(s_params)

        b, h, w = 8, 96, 96
        rnd = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(rnd.rand(b, h, w, 3).astype(np.float32)),
            "image_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
            "original_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
        }
        loss, loss_dict, sp, ss, _ = step(
            replicate(t_params, mesh), replicate(t_state, mesh),
            replicate(s_params, mesh), replicate(s_state, mesh),
            replicate(opt_state, mesh), put_batch(batch, mesh),
            put_batch(self._targets(b), mesh), jax.random.PRNGKey(7))

        assert np.isfinite(float(loss))
        # 4 GHND feature terms + the surfaced task-loss terms
        assert set(loss_dict) >= {"layer1", "layer2", "layer3", "layer4",
                                  "org_loss_objectness"}
        assert all(np.isfinite(float(v)) for v in loss_dict.values())
        # the task loss actually contributes to the scalar
        distill_only = sum(float(loss_dict[f"layer{i}"]) for i in (1, 2, 3, 4))
        org_sum = sum(float(v) for k, v in loss_dict.items()
                      if k.startswith("org_"))
        assert float(loss) == pytest.approx(distill_only + 0.5 * org_sum,
                                            rel=1e-4)
        # and the params moved
        enc_old = np.asarray(
            s_params["backbone"]["body"]["layer1"]["encoder"]["conv0"]["w"])
        enc_new = np.asarray(
            sp["backbone"]["body"]["layer1"]["encoder"]["conv0"]["w"])
        assert np.abs(enc_new - enc_old).max() > 0

    def test_missing_targets_raises(self, models):
        teacher, t_params, t_state, student, s_params, s_state = models
        cfg = criterion_cfg([1])
        cfg["params"]["org_loss_factor"] = 1.0
        box = DistillationBox(teacher, student, cfg)
        with pytest.raises(AssertionError, match="org_loss_factor"):
            box.loss(t_params, t_state, s_params, s_state,
                     make_batch(b=2), targets=None, rng=None)


class TestParamUtils:
    def test_trainable_mask_and_names(self, models):
        _, _, _, _, s_params, _ = models
        mask = trainable_mask(s_params, FROZEN)
        names = updatable_param_names(s_params, FROZEN)
        assert all(n.startswith("backbone.body.layer1")
                   or n.startswith("backbone.body.conv1")
                   or n.startswith("backbone.body.bn1") for n in names)
        assert any("encoder" in n for n in names)
        total = count_params(s_params)
        assert total > 40_000_000  # ~ R50+FPN detector scale


class TestSchedule:
    def test_multistep_with_warmup(self):
        from hnd_ghnd_tpu.parallel.mesh import build_schedule
        sched = build_schedule(1e-3, {"type": "MultiStepLR",
                                      "params": {"milestones": [5, 15],
                                                 "gamma": 0.1}},
                               steps_per_epoch=10, warmup_iters=5)
        assert float(sched(0)) == pytest.approx(1e-3 / 1000.0)
        assert float(sched(5)) == pytest.approx(1e-3)
        assert float(sched(49)) == pytest.approx(1e-3)
        assert float(sched(50)) == pytest.approx(1e-4)
        assert float(sched(150)) == pytest.approx(1e-5)
