"""End-to-end runner tests on the synthetic COCO fixture (tiny buckets)."""
import argparse
import os

import numpy as np
import pytest
import yaml

from tests.fixtures import make_coco_fixture


def tiny_tpu_block():
    return {"buckets": [[96, 96]], "min_sizes": [64], "max_size": 96}


def dataset_block(img_dir, ann_file):
    split = {"images": img_dir, "annotations": ann_file,
             "remove_non_annotated_imgs": False, "jpeg_quality": None}
    return {"name": "tiny", "num_workers": 2,
            "splits": {"train": dict(split), "val": dict(split),
                       "test": dict(split)}}


def model_block(kind="faster_rcnn", bottleneck=None, num_classes=5,
                ext=False, ckpt=None):
    backbone = {"name": "resnet50",
                "params": {"pretrained": False, "freeze_layers": True}}
    if bottleneck:
        backbone = {"name": "custom_resnet50",
                    "params": {"pretrained": False, "freeze_layers": False,
                               "layer1": {"name": "Bottleneck4LargeResNet",
                                          "bottleneck_channel": bottleneck}}}
    if ext:
        backbone["ext_config"] = {"backbone_frozen": True, "threshold": 0.01,
                                  "ckpt": ckpt}
    out = {"name": kind, "backbone": backbone,
           "params": {"num_classes": num_classes, "pretrained": False}}
    if kind == "keypoint_rcnn":
        out["params"]["num_keypoints"] = 17
    if ckpt and not ext:
        out["ckpt"] = ckpt
    return out


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner_coco")
    return make_coco_fixture(str(root), num_images=8, seed=7, num_classes=4)


class TestMimicRunner:
    def test_distill_and_eval(self, fixture, tmp_path):
        from hnd_ghnd_tpu.runners import mimic_runner
        img_dir, ann_file = fixture
        ckpt = str(tmp_path / "student.pt")
        config = {
            "dataset": dataset_block(img_dir, ann_file),
            "teacher_model": model_block("faster_rcnn"),
            "student_model": {
                **model_block("faster_rcnn", bottleneck=3, ckpt=ckpt),
                "bottleneck_transformer": {
                    "order": ["quantizer", "dequantizer"],
                    "components": {
                        "quantizer": {"params": {"num_bits": 8}},
                        "dequantizer": {"params": {"num_bits": 8}}}},
                "distill_backbone_only": True,
                "frozen_modules": ["backbone.body.layer2",
                                   "backbone.body.layer3",
                                   "backbone.body.layer4",
                                   "backbone.fpn", "rpn", "roi_heads"],
            },
            "train": {
                "num_epochs": 1, "batch_size": 4, "log_freq": 1,
                "ckpt_backend": "orbax",
                "optimizer": {"type": "Adam", "params": {"lr": 0.001}},
                "criterion": {
                    "type": "general", "params": {"org_loss_factor": 0.0},
                    "terms": {"layer1": {
                        "ts_modules": ["backbone.body.layer1"] * 2,
                        "criterion": {"type": "MSELoss",
                                      "params": {"reduction": "sum"}},
                        "factor": 1.0}}},
                "scheduler": {"type": "MultiStepLR",
                              "params": {"milestones": [10], "gamma": 0.1}},
            },
            "test": {"batch_size": 1},
            "tpu": tiny_tpu_block(),
        }
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        tb_dir = str(tmp_path / "tb")
        args = argparse.Namespace(
            config=str(cfg_path), json=None, device=None, world_size=None,
            dist_url=None, seed=0, distill=True, test_only=False,
            student_only=False, transform_bottleneck=True,
            skip_teacher_eval=True, tb_dir=tb_dir)
        mimic_runner.main(args)
        # best ckpt written through the orbax backend (a directory) and
        # loadable via the auto-detecting loader
        assert os.path.isdir(ckpt)
        from hnd_ghnd_tpu.utils import ckpt as ckpt_util
        payload = ckpt_util.load_ckpt(ckpt)
        assert payload["params"] is not None
        # optimizer state rides in the ckpt so resume restores it (the
        # reference restores optimizer + scheduler, models/__init__.py:20-35)
        assert payload.get("opt_state") is not None
        # TensorBoard curves were written and parse back
        from hnd_ghnd_tpu.utils.tensorboard import read_scalars
        events = [f for f in os.listdir(tb_dir)
                  if f.startswith("events.out.tfevents")]
        assert len(events) == 1
        tags = {t for t, _, _ in read_scalars(os.path.join(tb_dir,
                                                           events[0]))}
        assert "train/loss" in tags and "val/map" in tags


class TestCocoRunner:
    def test_train_eval_ckpt(self, fixture, tmp_path):
        """End-to-end supervised training through coco_runner.main: warmup
        schedule, per-epoch val eval, best-mAP ckpt with optimizer state,
        TensorBoard curves, final test eval (reference src/coco_runner.py)."""
        from hnd_ghnd_tpu.runners import coco_runner
        img_dir, ann_file = fixture
        ckpt = str(tmp_path / "org.pt")
        config = {
            "dataset": dataset_block(img_dir, ann_file),
            "model": {
                "name": "faster_rcnn",
                "backbone": {"name": "resnet18",
                             "params": {"pretrained": False}},
                "params": {"num_classes": 5, "pretrained": False},
                "ckpt": ckpt,
            },
            "train": {
                "num_epochs": 1, "batch_size": 2, "log_freq": 1,
                "optimizer": {"type": "SGD",
                              "params": {"lr": 0.0075, "momentum": 0.9,
                                         "weight_decay": 0.0001}},
                "scheduler": {"type": "MultiStepLR",
                              "params": {"milestones": [16, 22],
                                         "gamma": 0.1}},
            },
            "test": {"batch_size": 1},
            "tpu": tiny_tpu_block(),
        }
        cfg_path = tmp_path / "org_cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        tb_dir = str(tmp_path / "tb_org")
        args = argparse.Namespace(
            config=str(cfg_path), json=None, device=None, world_size=None,
            dist_url=None, seed=0, train=True, test_only=False,
            tb_dir=tb_dir)
        coco_runner.main(args)

        from hnd_ghnd_tpu.utils.tensorboard import read_scalars
        events = [f for f in os.listdir(tb_dir)
                  if f.startswith("events.out.tfevents")]
        assert len(events) == 1
        tags = {t for t, _, _ in read_scalars(os.path.join(tb_dir,
                                                           events[0]))}
        assert "train/loss" in tags and "val/map" in tags
        if os.path.exists(ckpt):  # written only when val mAP improved on 0.0
            from hnd_ghnd_tpu.utils import ckpt as ckpt_util
            payload = ckpt_util.load_ckpt(ckpt)
            # resume restores the optimizer (the schedule step rides in
            # opt_state's count) — the payload must carry it
            assert payload.get("opt_state") is not None


class TestMimicRunnerStackedDispatch:
    def test_spd_loop_covers_stacked_and_remainder(self, fixture, tmp_path):
        """tpu.steps_per_dispatch=3 with 4 loader batches/epoch: the loop
        runs ONE stacked dispatch (3 microsteps) plus ONE remainder step
        through the plain spd=1 step, and the per-microstep metric entries
        carry consecutive step indices 1..4 (runners/mimic_runner.py
        dispatch + StepMetrics stacked-entry expansion)."""
        from hnd_ghnd_tpu.runners import mimic_runner
        img_dir, ann_file = fixture
        ckpt = str(tmp_path / "student_spd.pt")
        config = {
            "dataset": dataset_block(img_dir, ann_file),
            "teacher_model": model_block("faster_rcnn"),
            "student_model": {
                **model_block("faster_rcnn", bottleneck=3, ckpt=ckpt),
                "distill_backbone_only": True,
                "frozen_modules": ["backbone.body.layer2",
                                   "backbone.body.layer3",
                                   "backbone.body.layer4",
                                   "backbone.fpn", "rpn", "roi_heads"],
            },
            "train": {
                "num_epochs": 1, "batch_size": 2, "log_freq": 1,
                "optimizer": {"type": "Adam", "params": {"lr": 0.001}},
                "criterion": {
                    "type": "general", "params": {"org_loss_factor": 0.0},
                    "terms": {"layer1": {
                        "ts_modules": ["backbone.body.layer1"] * 2,
                        "criterion": {"type": "MSELoss",
                                      "params": {"reduction": "sum"}},
                        "factor": 1.0}}},
            },
            "test": {"batch_size": 1},
            "tpu": {**tiny_tpu_block(), "steps_per_dispatch": 3},
        }
        cfg_path = tmp_path / "cfg_spd.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        tb_dir = str(tmp_path / "tb_spd")
        args = argparse.Namespace(
            config=str(cfg_path), json=None, device=None, world_size=None,
            dist_url=None, seed=0, distill=True, test_only=False,
            student_only=False, transform_bottleneck=False,
            skip_teacher_eval=True, tb_dir=tb_dir)
        mimic_runner.main(args)

        assert os.path.exists(ckpt)
        from hnd_ghnd_tpu.utils.tensorboard import read_scalars
        events = [f for f in os.listdir(tb_dir)
                  if f.startswith("events.out.tfevents")]
        assert len(events) == 1
        loss_steps = sorted(s for t, _, s in read_scalars(
            os.path.join(tb_dir, events[0])) if t == "train/loss")
        # 8 fixture images / batch 2 = 4 steps: microsteps 1-3 from the one
        # stacked dispatch, step 4 from the epoch-end remainder
        assert loss_steps == [1, 2, 3, 4]


class TestExtRunner:
    def test_ext_train_and_threshold_table(self, tmp_path, capsys):
        from hnd_ghnd_tpu.runners import ext_runner
        img_dir, ann_file = make_coco_fixture(
            str(tmp_path / "kp"), num_images=6, seed=9, keypoints=True,
            num_classes=1)
        ckpt = str(tmp_path / "ext.pt")
        config = {
            "dataset": dataset_block(img_dir, ann_file),
            "model": model_block("keypoint_rcnn", bottleneck=3,
                                 num_classes=2, ext=True, ckpt=ckpt),
            "train": {
                "num_epochs": 1, "batch_size": 2, "log_freq": 1,
                "optimizer": {"type": "SGD",
                              "params": {"lr": 0.001, "momentum": 0.9,
                                         "weight_decay": 0.0001}},
                "scheduler": {"type": "MultiStepLR",
                              "params": {"milestones": [15], "gamma": 0.1}},
            },
            "test": {"batch_size": 1},
            "tpu": tiny_tpu_block(),
        }
        cfg_path = tmp_path / "ext_cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        tb_dir = str(tmp_path / "tb")
        args = argparse.Namespace(
            config=str(cfg_path), json=None, device=None, world_size=None,
            dist_url=None, seed=0, train=True, test_only=False,
            min_recall=0.5, tb_dir=tb_dir, profile_dir=None)
        ext_runner.main(args)
        out = capsys.readouterr().out
        assert "ROC-AUC" in out
        # observability parity with the other runners: loss + per-epoch
        # val curves land in TensorBoard
        from hnd_ghnd_tpu.utils.tensorboard import read_scalars
        events = [f for f in os.listdir(tb_dir)
                  if f.startswith("events.out.tfevents")]
        assert len(events) == 1
        tags = {t for t, _, _ in read_scalars(os.path.join(tb_dir,
                                                           events[0]))}
        assert "train/loss" in tags
        assert "val/accuracy" in tags and "val/recall" in tags
        # the ext ckpt carries the optimizer state so a second run resumes
        # optimizer + best ROC-AUC (reference ext_runner.py:131-134)
        if os.path.exists(ckpt):  # written only when val AUC improved on 0.0
            from hnd_ghnd_tpu.utils import ckpt as ckpt_util
            payload = ckpt_util.load_ckpt(ckpt)
            assert payload.get("opt_state") is not None
            ext_runner.main(args)  # second run: exercises the resume path
            assert "resumed ext training" in capsys.readouterr().out

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"
