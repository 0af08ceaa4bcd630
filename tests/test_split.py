import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnd_ghnd_tpu.models.factory import build_model
from hnd_ghnd_tpu.split.deploy import (SplitRCNN, WirePacket, pack_wire,
                                       unpack_wire, split_rcnn_model)

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


def make_images(b=1, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, BUCKET[0], BUCKET[1], 3).astype(np.float32)


class TestWireFormat:
    def test_roundtrip(self):
        p = WirePacket(np.arange(24, dtype=np.uint8).reshape(1, 2, 3, 4),
                       0.5, 3.0, np.asarray([[96, 128]], np.int32),
                       np.asarray([[48, 64]], np.int32),
                       np.asarray([[0.1, 0.9]], np.float32))
        buf = pack_wire(p)
        q = unpack_wire(buf)
        np.testing.assert_array_equal(q.tensor, p.tensor)
        assert q.scale == p.scale and q.zero_point == p.zero_point
        np.testing.assert_array_equal(q.image_sizes, p.image_sizes)
        np.testing.assert_allclose(q.ext_logits, p.ext_logits)

    def test_wire_is_compact(self):
        # int8 bottleneck of a 96x128 image, b=3: (24+4)x(32+4)x3 bytes + meta
        t = np.zeros((1, 28, 36, 3), np.uint8)
        p = WirePacket(t, 1.0, 0.0, np.asarray([[96, 128]], np.int32),
                       np.asarray([[96, 128]], np.int32), None)
        buf = pack_wire(p)
        assert len(buf) < t.size + 400  # payload + small header


class TestSplitParity:
    def test_split_matches_full_model(self, student):
        model, params, state = student
        images = make_images()
        batch = {"images": jnp.asarray(images),
                 "image_sizes": jnp.asarray([[96, 128]], jnp.int32),
                 "original_sizes": jnp.asarray([[48, 64]], jnp.int32)}
        full, _, _ = model.forward(params, state, batch, training=False,
                                   use_bottleneck_transformer=True)

        split = SplitRCNN(model, quant_bits=8)
        head_jit, tail_call, _ = split.build(params, state)
        wire = split.run_edge(head_jit, images, batch["image_sizes"],
                              batch["original_sizes"])
        assert wire is not None
        dets = split.run_server(tail_call, wire, BUCKET)

        np.testing.assert_allclose(np.asarray(full["boxes"]), dets["boxes"],
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(full["scores"]), dets["scores"],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(full["labels"]),
                                      dets["labels"])

    def test_fp16_wire_variant(self, student):
        model, params, state = student
        images = make_images(seed=3)
        split = SplitRCNN(model, quant_bits=16)
        head_jit, tail_call, _ = split.build(params, state)
        sizes = np.asarray([[96, 128]], np.int32)
        wire = split.run_edge(head_jit, images, sizes, sizes)
        p = unpack_wire(wire)
        assert p.tensor.dtype == np.float16
        dets = split.run_server(tail_call, wire, BUCKET)
        assert np.isfinite(dets["boxes"]).all()

    def test_head_tail_param_partition_is_disjoint_and_complete(self, student):
        model, params, state = student
        _, _, (head_params, tail_params) = split_rcnn_model(
            model, params, state, 8)
        import jax.tree_util as jtu
        n_head = sum(x.size for x in jtu.tree_leaves(head_params))
        n_tail = sum(x.size for x in jtu.tree_leaves(tail_params))
        n_full = sum(x.size for x in jtu.tree_leaves(params))
        assert n_head + n_tail == n_full
        # head must be small (edge device): < 5% of total
        assert n_head < 0.05 * n_full


class TestExtAbort:
    def test_edge_aborts_below_threshold(self):
        model = build_model({
            "name": "faster_rcnn",
            "backbone": {"name": "custom_resnet50",
                         "params": {"pretrained": False,
                                    "freeze_layers": False,
                                    "layer1": {"name": "Bottleneck4LargeResNet",
                                               "bottleneck_channel": 3}},
                         "ext_config": {"threshold": 0.5,
                                        "backbone_frozen": True}},
            "bottleneck_transformer": {
                "order": ["quantizer", "dequantizer"],
                "components": {"quantizer": {"params": {"num_bits": 8}},
                               "dequantizer": {"params": {"num_bits": 8}}}},
            "params": {"num_classes": 7},
        })
        params, state = model.init(jax.random.PRNGKey(1))
        split = SplitRCNN(model, 8)
        head_jit, _, _ = split.build(params, state)
        images = make_images()
        sizes = np.asarray([[96, 128]], np.int32)
        # threshold 1.1 can never pass a softmax output -> abort
        wire = split.run_edge(head_jit, images, sizes, sizes,
                              ext_threshold=1.1)
        assert wire is None
        # threshold 0 always passes
        wire = split.run_edge(head_jit, images, sizes, sizes,
                              ext_threshold=0.0)
        assert wire is not None
        assert unpack_wire(wire).ext_logits is not None

pytestmark = pytest.mark.slow  # full-detector compiles; run fast core with -m "not slow"


@pytest.mark.slow
class TestJpegInputSplit:
    def test_rgb_over_wire_matches_direct_forward(self, student):
        """Server detections from the JPEG wire must equal a direct forward
        on the decoded pixels (bit-identical inputs => identical outputs)."""
        import io
        import numpy as np
        from PIL import Image
        from hnd_ghnd_tpu.split.deploy import JpegInputSplit, _MAGIC_JPEG

        model, params, state = student
        b, h, w = 1, 64, 96
        rng = np.random.RandomState(0)
        images = rng.rand(b, h, w, 3).astype(np.float32)
        image_sizes = np.asarray([[56, 88]], np.int32)
        original_sizes = np.asarray([[112, 176]], np.int32)

        split = JpegInputSplit(model, quality=95)
        wire = split.run_edge(images, image_sizes, original_sizes)
        assert wire[:4] == _MAGIC_JPEG
        # wire must be smaller than raw valid pixels x4 bytes
        assert len(wire) < 56 * 88 * 3 * 4

        server_call = split.build_server(params, state)
        dets = split.run_server(server_call, wire, (h, w))

        # rebuild the server's exact input on the host and run directly
        import json as _json
        import struct as _struct
        (mlen,) = _struct.unpack("<I", wire[4:8])
        meta = _json.loads(wire[8:8 + mlen].decode())
        u8 = np.asarray(Image.open(io.BytesIO(wire[8 + mlen:]))
                        .convert("RGB"), np.uint8)
        direct_imgs = np.zeros((b, h, w, 3), np.float32)
        direct_imgs[0, :56, :88] = u8.astype(np.float32) / 255.0
        import jax.numpy as jnp
        direct, _, _ = model.forward(
            params, state,
            {"images": jnp.asarray(direct_imgs),
             "image_sizes": jnp.asarray(image_sizes),
             "original_sizes": jnp.asarray(original_sizes)},
            training=False)
        np.testing.assert_allclose(np.asarray(dets["boxes"]),
                                   np.asarray(direct["boxes"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dets["valid"]),
                                      np.asarray(direct["valid"]))


class TestMalformedWire:
    """The wire crosses a real network boundary: every corruption class must
    fail with WireError before any byte is interpreted as tensor data
    (reference boundary: the head output tuple, split_rcnn.py:23-37)."""

    def _good_packet(self):
        from hnd_ghnd_tpu.split.deploy import WirePacket, pack_wire
        t = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(1, 6, 4, 3)
        return pack_wire(WirePacket(
            t, 0.5, 3.0, np.asarray([[96, 128]], np.int32),
            np.asarray([[48, 64]], np.int32),
            np.asarray([[0.1, 0.9]], np.float32)))

    def test_good_packet_decodes(self):
        from hnd_ghnd_tpu.split.deploy import unpack_wire
        p = unpack_wire(self._good_packet())
        assert p.tensor.shape == (1, 6, 4, 3)

    def test_bad_magic(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        buf = b"XXXX" + self._good_packet()[4:]
        with pytest.raises(WireError, match="magic"):
            unpack_wire(buf)

    def test_truncated_header(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="truncated"):
            unpack_wire(b"HGW")

    def test_truncated_metadata(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="truncated"):
            unpack_wire(self._good_packet()[:10])

    def test_truncated_body(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        buf = self._good_packet()
        with pytest.raises(WireError, match="body"):
            unpack_wire(buf[:-5])

    def test_oversized_body(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="body"):
            unpack_wire(self._good_packet() + b"\x00" * 8)

    def test_oversized_meta_length(self):
        import struct
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        buf = self._good_packet()
        evil = buf[:4] + struct.pack("<I", 1 << 24) + buf[8:]
        with pytest.raises(WireError, match="cap|truncated"):
            unpack_wire(evil)

    def test_non_json_metadata(self):
        import struct
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        mb = b"\xff\xfe not json"
        buf = b"HGW1" + struct.pack("<I", len(mb)) + mb + b"\x00" * 16
        with pytest.raises(WireError, match="JSON"):
            unpack_wire(buf)

    def _tamper_meta(self, **kv):
        """Re-encode the good packet with tampered metadata fields."""
        import json
        import struct
        buf = self._good_packet()
        (mlen,) = struct.unpack("<I", buf[4:8])
        meta = json.loads(buf[8:8 + mlen].decode())
        meta.update(kv)
        mb = json.dumps(meta).encode()
        return buf[:4] + struct.pack("<I", len(mb)) + mb + buf[8 + mlen:]

    def test_disallowed_dtype(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="dtype"):
            unpack_wire(self._tamper_meta(dtype="object"))
        with pytest.raises(WireError, match="dtype"):
            unpack_wire(self._tamper_meta(dtype="int64"))

    def test_shape_body_mismatch(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="body|shape"):
            unpack_wire(self._tamper_meta(shape=[1, 100, 100, 3]))

    def test_negative_and_malformed_shape(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="shape"):
            unpack_wire(self._tamper_meta(shape=[1, -6, 4, 3]))
        with pytest.raises(WireError, match="shape"):
            unpack_wire(self._tamper_meta(shape=[6, 4, 3]))
        with pytest.raises(WireError, match="shape"):
            unpack_wire(self._tamper_meta(shape="evil"))

    def test_huge_claimed_tensor_rejected_before_alloc(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="cap|body"):
            unpack_wire(self._tamper_meta(shape=[1 << 20, 1 << 12, 1 << 12, 3]))

    def test_bad_image_sizes(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="image_sizes"):
            unpack_wire(self._tamper_meta(image_sizes=[[0, 128]]))
        with pytest.raises(WireError, match="image_sizes"):
            unpack_wire(self._tamper_meta(image_sizes=[[96, 128], [96, 128]]))
        with pytest.raises(WireError, match="image_sizes"):
            unpack_wire(self._tamper_meta(image_sizes="evil"))

    def test_bad_scale(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="scale"):
            unpack_wire(self._tamper_meta(scale="evil"))

    def test_bad_ext_logits(self):
        from hnd_ghnd_tpu.split.deploy import WireError, unpack_wire
        with pytest.raises(WireError, match="ext"):
            unpack_wire(self._tamper_meta(ext=[[1.0, 2.0, 3.0]]))

    def test_jpeg_wire_corruption(self):
        import struct
        from hnd_ghnd_tpu.split.deploy import WireError, JpegInputSplit

        split = JpegInputSplit(model=None)
        with pytest.raises(WireError, match="magic"):
            split.run_server(None, b"XXXX" + b"\x00" * 16, (64, 96))
        with pytest.raises(WireError, match="truncated"):
            split.run_server(None, b"HGJ", (64, 96))
        mb = b'{"lengths": [999], "image_sizes": [[56, 88]], "original_sizes": [[112, 176]]}'
        buf = b"HGJ1" + struct.pack("<I", len(mb)) + mb + b"\x00" * 8
        with pytest.raises(WireError, match="length"):
            split.run_server(None, buf, (64, 96))
