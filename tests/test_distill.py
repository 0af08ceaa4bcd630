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
