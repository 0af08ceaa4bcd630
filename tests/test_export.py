"""AOT split export: serialized head/tail must reproduce the live split."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.models.factory import build_model
from hnd_ghnd_tpu.split.deploy import SplitRCNN
from hnd_ghnd_tpu.split.export import export_split, load_exported

BUCKET = (96, 128)


@pytest.fixture(scope="module")
def student():
    model = build_model({
        "name": "faster_rcnn",
        "backbone": {"name": "custom_resnet50",
                     "params": {"pretrained": False, "freeze_layers": False,
                                "layer1": {"name": "Bottleneck4LargeResNet",
                                           "bottleneck_channel": 3}}},
        "params": {"num_classes": 7},
    })
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


class TestExportedSplit:
    def test_roundtrip_matches_live_split(self, student):
        model, params, state = student
        blob = export_split(model, params, state, BUCKET, batch=1,
                            quant_bits=8)
        assert isinstance(blob, bytes) and len(blob) > 100_000  # weights baked
        exported = load_exported(blob)
        assert exported.meta["kind"] == "faster_rcnn"
        assert exported.meta["bottleneck_channel"] == 3

        rng = np.random.RandomState(0)
        images = jnp.asarray(
            rng.rand(1, BUCKET[0], BUCKET[1], 3).astype(np.float32))
        sizes = jnp.asarray([[96, 128]], jnp.int32)

        split = SplitRCNN(model, 8)
        head_jit, tail_call, _ = split.build(params, state)
        want_q, want_s, want_zp, _ = head_jit(images)
        got_q, got_s, got_zp, got_ext = exported.head(images)
        np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
        assert float(got_s) == pytest.approx(float(want_s), rel=1e-6)

        want = tail_call(want_q, want_s, want_zp, sizes, BUCKET)
        got = exported.tail(got_q, float(got_s), float(got_zp), sizes)
        np.testing.assert_allclose(np.asarray(got["boxes"]),
                                   np.asarray(want["boxes"]),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(got["labels"]),
                                      np.asarray(want["labels"]))

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"


@pytest.mark.slow
class TestExportedShardedTail:
    """VERDICT r4 #4: the multi-device serving artifact.  The tail exported
    under shard_map over an n-device mesh must reproduce, per shard, the
    single-device tail run on that shard's packet — including per-edge
    quantization scales."""

    def test_sharded_tail_matches_per_shard_oracle(self, student):
        from hnd_ghnd_tpu.parallel.mesh import make_mesh
        from hnd_ghnd_tpu.split.export import (ExportedShardedTail,
                                               export_sharded_tail,
                                               load_exported)

        model, params, state = student
        n = 2
        mesh = make_mesh(jax.devices()[:n])
        blob = export_sharded_tail(model, params, state, BUCKET, mesh,
                                   batch_per_shard=1, quant_bits=8)
        loaded = load_exported(blob)
        assert isinstance(loaded, ExportedShardedTail)
        assert loaded.n_devices == n and loaded.bucket_hw == BUCKET

        split = SplitRCNN(model, 8)
        head_jit, tail_call, _ = split.build(params, state)
        rng = np.random.RandomState(1)
        qs, ss, zps, szs, oracle = [], [], [], [], []
        sizes = jnp.asarray([[96, 128]], jnp.int32)
        for _ in range(n):
            images = jnp.asarray(
                rng.rand(1, BUCKET[0], BUCKET[1], 3).astype(np.float32))
            q, s, zp, _ = head_jit(images)
            want = tail_call(q, s, zp, sizes, BUCKET)
            qs.append(np.asarray(q))
            ss.append(float(s))
            zps.append(float(zp))
            szs.append(np.asarray(sizes))
            oracle.append({k: np.asarray(v) for k, v in want.items()})
        assert ss[0] != ss[1]  # per-edge scales genuinely differ

        got = loaded.call(mesh, np.concatenate(qs),
                          np.asarray(ss, np.float32),
                          np.asarray(zps, np.float32), np.concatenate(szs))
        got = {k: np.asarray(v) for k, v in got.items()}
        for i in range(n):
            np.testing.assert_allclose(got["boxes"][i],
                                       oracle[i]["boxes"][0],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(got["scores"][i],
                                       oracle[i]["scores"][0],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_array_equal(got["labels"][i],
                                          oracle[i]["labels"][0])

        with pytest.raises(ValueError, match="exported for 2 devices"):
            loaded.call(make_mesh(jax.devices()[:1]), np.concatenate(qs),
                        np.asarray(ss, np.float32),
                        np.asarray(zps, np.float32), np.concatenate(szs))


@pytest.mark.slow
class TestExportedSplitSet:
    def test_bucket_set_roundtrip_and_dispatch(self, student):
        import numpy as np
        import jax.numpy as jnp
        from hnd_ghnd_tpu.split.export import (export_split_set,
                                               load_exported,
                                               ExportedSplitSet)

        model, params, state = student
        buckets = [(64, 96), (96, 64)]
        blob = export_split_set(model, params, state, buckets, batch=1,
                                quant_bits=8)
        loaded = load_exported(blob)
        assert isinstance(loaded, ExportedSplitSet)
        assert loaded.buckets == sorted(buckets)

        for h, w in buckets:
            images = jnp.asarray(
                np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)
            q, scale, zp, ext = loaded.head(images)
            dets = loaded.tail((h, w), q, scale, zp,
                               np.asarray([[h - 8, w - 8]], np.int32))
            assert np.asarray(dets["boxes"]).shape[0] == 1
