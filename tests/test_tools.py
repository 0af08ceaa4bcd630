"""cost_analyzer + visualizer end-to-end on the synthetic fixture."""
import argparse
import os

import numpy as np
import pytest
import yaml

from tests.fixtures import make_coco_fixture
from tests.test_runners import dataset_block, model_block, tiny_tpu_block


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    img_dir, ann_file = make_coco_fixture(str(root), num_images=4, seed=5)
    config = {
        "dataset": dataset_block(img_dir, ann_file),
        "model": model_block("faster_rcnn", bottleneck=3, num_classes=5),
        "train": {"num_epochs": 1, "batch_size": 2,
                  "optimizer": {"type": "Adam", "params": {"lr": 1e-3}}},
        "test": {"batch_size": 1},
        "tpu": tiny_tpu_block(),
    }
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return str(cfg_path), img_dir, str(root)


class TestCostAnalyzer:
    def test_all_analyses(self, setup, capsys):
        from hnd_ghnd_tpu.runners import cost_analyzer
        cfg_path, img_dir, root = setup
        args = argparse.Namespace(
            config=cfg_path, json=None, device=None, world_size=None,
            dist_url=None, seed=0, model_params=True, data_size=True,
            bottleneck_size=True, split_model=True, quantization=8,
            max_images=2, resized=True, int8_tail=True, calib_images=2)
        cost_analyzer.main(args)
        out = capsys.readouterr().out
        assert "parameter counts" in out
        assert "split head (edge)" in out
        assert "comm delay" in out
        assert "bottleneck fp32" in out
        assert "head latency" in out
        assert "mAP" in out
        # the int8 server tail A/B (split/int8.py): latency + mAP delta
        assert "int8 tail calibrated on 2 images" in out
        assert "int8 tail latency" in out
        assert "int8 tail mAP delta [bbox]" in out

    def test_reference_cli_selectors(self, setup, capsys):
        """Reference flag semantics (src/cost_analyzer.py:26-34): split names
        for the analysis selectors, --modules param table, -skip_tail."""
        from hnd_ghnd_tpu.runners import cost_analyzer
        cfg_path, img_dir, root = setup
        args = cost_analyzer.get_argparser().parse_args(
            ["--config", cfg_path, "--model_params",
             "--modules", "backbone.body.layer1", "rpn.head",
             "--data_size", "test", "--split_model", "test", "-skip_tail",
             "--quantize", "8", "--max_images", "2"])
        assert args.split_model == "test" and args.skip_tail
        assert args.quantization == 8
        cost_analyzer.main(args)
        out = capsys.readouterr().out
        assert "[Specified module(s)]" in out
        assert "backbone.body.layer1:" in out
        assert "Total # parameters:" in out
        assert "head latency" in out
        # -skip_tail: no tail timing, no evaluation
        assert "tail latency" not in out.replace("head latency", "")
        assert "mAP" not in out

    def test_bare_selector_flags_still_work(self, setup):
        from hnd_ghnd_tpu.runners import cost_analyzer
        args = cost_analyzer.get_argparser().parse_args(
            ["--config", "x", "--split_model", "--bottleneck_size"])
        assert args.split_model == "test"
        assert args.bottleneck_size == "test"
        assert args.data_size is None


class TestVisualizer:
    def test_writes_overlays(self, setup):
        from hnd_ghnd_tpu.runners import visualizer
        cfg_path, img_dir, root = setup
        image = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        out_dir = os.path.join(root, "viz")
        args = argparse.Namespace(
            config=cfg_path, json=None, device=None, world_size=None,
            dist_url=None, seed=0, image=[image], output=out_dir,
            score_threshold=0.0, transform_bottleneck=False)
        visualizer.main(args)
        out_path = os.path.join(out_dir, os.path.basename(image))
        assert os.path.exists(out_path)
        import cv2
        im = cv2.imread(out_path)
        assert im is not None and im.shape[2] == 3

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"
