"""Every shipped config parses, builds its models, and its criterion/optimizer
blocks are constructible — the schema-compatibility safety net."""
import glob
import os

import pytest

from hnd_ghnd_tpu.core.config import load_config, overwrite_config
from hnd_ghnd_tpu.distill.losses import get_loss
from hnd_ghnd_tpu.models.factory import build_model
from hnd_ghnd_tpu.parallel.mesh import build_optimizer

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "config")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_ROOT, "*", "*.yaml")))


def test_config_suite_is_complete():
    by_dir = {}
    for p in ALL_CONFIGS:
        by_dir.setdefault(os.path.basename(os.path.dirname(p)), []).append(p)
    assert len(by_dir.get("org", [])) == 3
    assert len(by_dir.get("hnd", [])) == 15   # 3 detectors x b{3,6,9,12,15}
    assert len(by_dir.get("ghnd", [])) == 12  # 3 detectors x b{3,6,9,12}
    assert len(by_dir.get("ext", [])) == 1


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: "/".join(p.split(os.sep)[-2:]))
def test_config_builds(path):
    config = load_config(path)
    assert "dataset" in config and "train" in config and "test" in config
    for key in ("model", "teacher_model", "student_model"):
        if key in config:
            model = build_model(config[key])
            assert model.kind in ("faster_rcnn", "mask_rcnn", "keypoint_rcnn")
    if "criterion" in config["train"]:
        crit = get_loss(config["train"]["criterion"])
        kind = os.path.basename(os.path.dirname(path))
        n_terms = len(crit.terms)
        assert n_terms == (1 if kind == "hnd" else 4)
        for (t_path, s_path), _, factor in crit.terms.values():
            assert t_path.startswith("backbone.body.layer")
            assert factor == 1.0
    optimizer, schedule = build_optimizer(
        config["train"]["optimizer"], config["train"].get("scheduler"),
        steps_per_epoch=100)
    assert float(schedule(0)) > 0


def test_json_override_merges_recursively():
    config = load_config(ALL_CONFIGS[0])
    old_epochs = config["train"]["num_epochs"]
    overwrite_config(config, '{"train": {"num_epochs": 99}}')
    assert config["train"]["num_epochs"] == 99
    assert config["train"]["optimizer"]["type"]  # untouched siblings survive


def test_join_tag():
    import yaml as _yaml
    from hnd_ghnd_tpu.core.config import _JoinLoader
    doc = "a: &x 'foo'\nb: !join [*x, '-', 'bar']\n"
    out = _yaml.load(doc, Loader=_JoinLoader)
    assert out["b"] == "foo-bar"
