import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.utils import ckpt as ckpt_util


class TestCkpt:
    def test_roundtrip_all_fields(self, tmp_path):
        params = {"a": {"w": jnp.ones((3, 4))}, "b": jnp.zeros(2)}
        state = {"bn": {"mean": jnp.full((2,), 0.5)}}
        opt = {"mu": jnp.ones(2)}
        path = str(tmp_path / "ckpt" / "model.pt")
        ckpt_util.save_ckpt(path, params=params, state=state, opt_state=opt,
                            best_value=0.371, config={"x": 1},
                            args={"seed": 3})
        assert ckpt_util.check_if_exists(path)
        payload = ckpt_util.load_ckpt(path)
        np.testing.assert_array_equal(payload["params"]["a"]["w"],
                                      np.ones((3, 4)))
        assert payload["best_value"] == 0.371
        assert payload["config"] == {"x": 1}
        assert payload["args"]["seed"] == 3
        np.testing.assert_array_equal(payload["state"]["bn"]["mean"],
                                      np.full((2,), 0.5))

    def test_partial_payload(self, tmp_path):
        path = str(tmp_path / "p.pt")
        ckpt_util.save_ckpt(path, params={"w": jnp.ones(1)})
        payload = ckpt_util.load_ckpt(path)
        assert payload["state"] is None and payload["opt_state"] is None

    def test_atomic_write_no_partial_file(self, tmp_path):
        path = str(tmp_path / "a.pt")
        ckpt_util.save_ckpt(path, params={"w": jnp.ones(1)})
        assert not os.path.exists(path + ".tmp")

    def test_factory_autoloads_config_ckpt(self, tmp_path):
        """get_model loads model_config['ckpt'] when present (reference
        src/models/__init__.py:56 semantics)."""
        from hnd_ghnd_tpu.models.factory import get_model
        cfg = {"name": "faster_rcnn",
               "backbone": {"name": "custom_resnet50",
                            "params": {"pretrained": False,
                                       "freeze_layers": False,
                                       "layer1": {"name": "Bottleneck4LargeResNet",
                                                  "bottleneck_channel": 3}}},
               "params": {"num_classes": 5},
               "ckpt": str(tmp_path / "m.pt")}
        model, params, state = get_model(cfg, seed=0)
        params["backbone"]["body"]["conv1"]["w"] = jnp.full_like(
            params["backbone"]["body"]["conv1"]["w"], 0.123)
        ckpt_util.save_ckpt(cfg["ckpt"], params=params, state=state,
                            best_value=0.5)
        _, params2, _ = get_model(cfg, seed=1)
        v = np.asarray(params2["backbone"]["body"]["conv1"]["w"])
        np.testing.assert_allclose(v, 0.123, rtol=1e-6)

    def test_check_if_exists_none(self):
        assert not ckpt_util.check_if_exists(None)
        assert not ckpt_util.check_if_exists("/nonexistent/x.pt")


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np
        from hnd_ghnd_tpu.utils import ckpt as ckpt_util

        params = {"layer": {"w": jnp.arange(12.0).reshape(3, 4),
                            "b": jnp.ones((4,))}}
        opt_state = {"mu": {"layer": {"w": jnp.zeros((3, 4)),
                                      "b": jnp.zeros((4,))}}}
        path = str(tmp_path / "ckpt_orbax")
        ckpt_util.save_ckpt(path, params=params, opt_state=opt_state,
                            best_value=0.7, config={"a": 1},
                            args={"lr": 0.1}, backend="orbax")
        assert ckpt_util.check_if_exists(path)
        payload = ckpt_util.load_ckpt(path)
        np.testing.assert_array_equal(
            np.asarray(payload["params"]["layer"]["w"]),
            np.arange(12.0).reshape(3, 4))
        assert payload["state"] is None
        assert payload["best_value"] == 0.7
        assert payload["config"] == {"a": 1}
        assert payload["args"] == {"lr": 0.1}
        np.testing.assert_array_equal(
            np.asarray(payload["opt_state"]["mu"]["layer"]["b"]),
            np.zeros((4,)))

    def test_orbax_overwrite(self, tmp_path):
        import jax.numpy as jnp
        from hnd_ghnd_tpu.utils import ckpt as ckpt_util

        path = str(tmp_path / "ck")
        for v in (1.0, 2.0):
            ckpt_util.save_ckpt(path, params={"w": jnp.full((2,), v)},
                                best_value=v, backend="orbax")
        payload = ckpt_util.load_ckpt(path)
        assert payload["best_value"] == 2.0

    def test_orbax_over_prior_pickle_file(self, tmp_path):
        """Switching ckpt_backend mid-experiment: an orbax save must replace
        a pre-existing pickle-backend *file* at the same path."""
        import jax.numpy as jnp
        from hnd_ghnd_tpu.utils import ckpt as ckpt_util

        path = str(tmp_path / "ck")
        ckpt_util.save_ckpt(path, params={"w": jnp.zeros((2,))},
                            best_value=1.0, backend="pickle")
        assert not __import__("os").path.isdir(path)
        ckpt_util.save_ckpt(path, params={"w": jnp.ones((2,))},
                            best_value=2.0, backend="orbax")
        payload = ckpt_util.load_ckpt(path)
        assert payload["best_value"] == 2.0

    def test_orbax_save_failure_keeps_previous(self, tmp_path, monkeypatch):
        """A crash mid-save must leave the previous checkpoint loadable
        (the save writes to a temp sibling and swaps only on success)."""
        import jax.numpy as jnp
        from hnd_ghnd_tpu.utils import ckpt as ckpt_util

        path = str(tmp_path / "ck")
        ckpt_util.save_ckpt(path, params={"w": jnp.zeros((2,))},
                            best_value=1.0, backend="orbax")

        real_dump = ckpt_util.pickle.dump

        def boom(*a, **k):
            raise RuntimeError("simulated crash during aux write")

        monkeypatch.setattr(ckpt_util.pickle, "dump", boom)
        try:
            ckpt_util.save_ckpt(path, params={"w": jnp.ones((2,))},
                                best_value=2.0, backend="orbax")
        except RuntimeError:
            pass
        monkeypatch.setattr(ckpt_util.pickle, "dump", real_dump)
        payload = ckpt_util.load_ckpt(path)
        assert payload["best_value"] == 1.0
