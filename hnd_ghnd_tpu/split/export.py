"""Ahead-of-time export of the split head/tail programs (jax.export).

Production-serving counterpart to split/deploy.py: the edge HEAD and server
TAIL are serialized as self-contained StableHLO artifacts (weights baked in)
that a serving process can deserialize and call **without the model code or
config** — the TPU-native analog of shipping a TorchScript/ONNX pair for the
reference's RcnnHead/RcnnTail split (src/models/mimic/split_rcnn.py).

Artifact layout (single file, pickle):
  {"format": "hnd-ghnd-split-v1",
   "bucket_hw": (H, W), "batch": B, "quant_bits": int|None,
   "head": bytes (StableHLO), "tail": bytes (StableHLO),
   "meta": {model kind, num_classes, bottleneck channels}}

Head signature:  images [B, H, W, 3] f32 in [0,1]
              -> (q_tensor, scale, zero_point, ext_logits)
Tail signature:  (q_tensor, scale, zero_point, image_sizes [B,2] i32)
              -> detection dict (padded-bucket coords)
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from hnd_ghnd_tpu.split.deploy import SplitRCNN, _split_head_params, _split_tail_params

FORMAT = "hnd-ghnd-split-v1"
FORMAT_SET = "hnd-ghnd-splitset-v2"
FORMAT_SHARDED = "hnd-ghnd-sharded-tail-v1"


def export_split(model, params, state, bucket_hw: Tuple[int, int],
                 batch: int = 1, quant_bits: Optional[int] = 8) -> bytes:
    """Serialize head+tail for one (bucket, batch) configuration."""
    split = SplitRCNN(model, quant_bits)
    head_params = _split_head_params(params)
    tail_params = _split_tail_params(params)
    l1_state = {"backbone": {"body": {
        "layer1": state["backbone"]["body"]["layer1"]}}}

    h, w = bucket_hw
    images_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)

    head_fn = jax.jit(lambda im: split.head_fn(head_params, l1_state, im))
    head_exp = jexport.export(head_fn)(images_spec)

    # derive the wire specs from an abstract head evaluation
    q_aval, s_aval, zp_aval, _ = jax.eval_shape(head_fn, images_spec)
    sizes_spec = jax.ShapeDtypeStruct((batch, 2), jnp.int32)
    tail_fn = jax.jit(lambda q, s, zp, sz: split.tail_fn(
        tail_params, l1_state, q, s, zp, sz, bucket_hw))
    tail_exp = jexport.export(tail_fn)(
        jax.ShapeDtypeStruct(q_aval.shape, q_aval.dtype),
        jax.ShapeDtypeStruct(s_aval.shape, s_aval.dtype),
        jax.ShapeDtypeStruct(zp_aval.shape, zp_aval.dtype),
        sizes_spec)

    return pickle.dumps({
        "format": FORMAT,
        "bucket_hw": tuple(bucket_hw),
        "batch": batch,
        "quant_bits": quant_bits,
        "head": head_exp.serialize(),
        "tail": tail_exp.serialize(),
        "meta": {
            "kind": model.kind,
            "num_classes": model.num_classes,
            "bottleneck_channel": getattr(model.bottleneck, "bch", None),
        },
    })


class ExportedSplit:
    """Deserialized split pair — callable without model code."""

    def __init__(self, blob):
        """Accepts the serialized bytes or an already-decoded payload dict
        (load_exported decodes once and passes the dict through, so a
        multi-hundred-MB artifact is not unpickled twice)."""
        payload = blob if isinstance(blob, dict) else pickle.loads(blob)
        assert payload["format"] == FORMAT, "unknown artifact format"
        self.bucket_hw = payload["bucket_hw"]
        self.batch = payload["batch"]
        self.quant_bits = payload["quant_bits"]
        self.meta = payload["meta"]
        self._head = jexport.deserialize(payload["head"])
        self._tail = jexport.deserialize(payload["tail"])

    def head(self, images):
        """images [B, H, W, 3] f32 -> (q, scale, zero_point, ext_logits)."""
        return self._head.call(images)

    def tail(self, q, scale, zero_point, image_sizes):
        """wire fields -> detection dict in padded-bucket coords."""
        return self._tail.call(q, jnp.float32(scale), jnp.float32(zero_point),
                               jnp.asarray(image_sizes, jnp.int32))


def export_split_set(model, params, state,
                     buckets, batch: int = 1,
                     quant_bits: Optional[int] = 8) -> bytes:
    """Serialize head+tail programs for a SET of buckets in one artifact.

    A real serving deployment compiles one program per static bucket
    (data/transforms.DEFAULT_BUCKETS: landscape + portrait); this bundles
    them so the server dispatches purely on the incoming wire shape.
    """
    entries = {}
    for bucket in buckets:
        blob = export_split(model, params, state, tuple(bucket), batch,
                            quant_bits)
        entries[tuple(bucket)] = blob
    return pickle.dumps({"format": FORMAT_SET, "batch": batch,
                         "quant_bits": quant_bits,
                         "buckets": {k: v for k, v in entries.items()}})


class ExportedSplitSet:
    """Bucket-dispatching wrapper over a set of exported split pairs."""

    def __init__(self, blob):
        payload = blob if isinstance(blob, dict) else pickle.loads(blob)
        assert payload["format"] == FORMAT_SET, "unknown artifact format"
        self.batch = payload["batch"]
        self.quant_bits = payload["quant_bits"]
        self._splits: Dict[Tuple[int, int], ExportedSplit] = {
            k: ExportedSplit(v) for k, v in payload["buckets"].items()}
        self.buckets = sorted(self._splits)

    def for_bucket(self, bucket_hw) -> ExportedSplit:
        return self._splits[tuple(bucket_hw)]

    def head(self, images):
        """Dispatch on the padded image shape."""
        return self.for_bucket(images.shape[1:3]).head(images)

    def tail(self, bucket_hw, q, scale, zero_point, image_sizes):
        return self.for_bucket(bucket_hw).tail(q, scale, zero_point,
                                               image_sizes)


def export_sharded_tail(model, params, state, bucket_hw: Tuple[int, int],
                        mesh, batch_per_shard: int = 1,
                        quant_bits: Optional[int] = 8) -> bytes:
    """Serving TAIL exported over a DEVICE MESH (the multi-chip serving
    artifact of ROADMAP #13).

    Deployment picture: n edge devices each send one wire packet
    (``batch_per_shard`` images quantized with that edge's own scale —
    the reference wire tuple, split_rcnn.py:23-37); the server holds an
    n-device mesh and batches the packets along the data axis.  The tail
    runs under ``jax.shard_map`` — one shard per device — because the RoI
    pooling inside is a ``pallas_call`` on TPU, which GSPMD cannot
    partition but per-shard SPMD runs unchanged (the same constraint that
    shaped sharded eval and the shard_map train steps).

    The exported artifact embeds the mesh size; deserialization requires a
    same-size mesh (``ExportedShardedTail.call`` takes it explicitly).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    split = SplitRCNN(model, quant_bits)
    head_params = _split_head_params(params)
    tail_params = _split_tail_params(params)
    l1_state = {"backbone": {"body": {
        "layer1": state["backbone"]["body"]["layer1"]}}}

    h, w = bucket_hw
    n = mesh.size
    axis = mesh.axis_names[0]
    images_spec = jax.ShapeDtypeStruct((batch_per_shard, h, w, 3),
                                       jnp.float32)
    q_aval, s_aval, zp_aval, _ = jax.eval_shape(
        lambda im: split.head_fn(head_params, l1_state, im), images_spec)

    def tail_local(q, s, zp, sz):
        # per-device shard: q [batch_per_shard, ...], s/zp [1] (this
        # shard's packet scale), sz [batch_per_shard, 2]
        return split.tail_fn(tail_params, l1_state, q, s[0], zp[0], sz,
                             (h, w))

    sharded = jax.shard_map(
        tail_local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False)  # pallas_call has no vma rule (mesh.py precedent)

    data = NamedSharding(mesh, P(axis))
    tail_exp = jexport.export(jax.jit(sharded))(
        jax.ShapeDtypeStruct((n * batch_per_shard,) + q_aval.shape[1:],
                             q_aval.dtype, sharding=data),
        jax.ShapeDtypeStruct((n,), s_aval.dtype, sharding=data),
        jax.ShapeDtypeStruct((n,), zp_aval.dtype, sharding=data),
        jax.ShapeDtypeStruct((n * batch_per_shard, 2), jnp.int32,
                             sharding=data))

    return pickle.dumps({
        "format": FORMAT_SHARDED,
        "bucket_hw": (h, w),
        "n_devices": n,
        "axis_name": axis,
        "batch_per_shard": batch_per_shard,
        "quant_bits": quant_bits,
        "tail": tail_exp.serialize(),
        "meta": {
            "kind": model.kind,
            "num_classes": model.num_classes,
            "bottleneck_channel": getattr(model.bottleneck, "bch", None),
        },
    })


class ExportedShardedTail:
    """Deserialized mesh-sharded tail — callable without model code on any
    mesh of the recorded size."""

    def __init__(self, blob):
        payload = blob if isinstance(blob, dict) else pickle.loads(blob)
        assert payload["format"] == FORMAT_SHARDED, "unknown artifact format"
        self.bucket_hw = payload["bucket_hw"]
        self.n_devices = payload["n_devices"]
        self.axis_name = payload["axis_name"]
        self.batch_per_shard = payload["batch_per_shard"]
        self.quant_bits = payload["quant_bits"]
        self.meta = payload["meta"]
        self._tail = jexport.deserialize(payload["tail"])

    def call(self, mesh, q, scales, zero_points, image_sizes):
        """Run the sharded tail on ``mesh`` (must match the exported size).

        q: [n*batch_per_shard, H', W', C'] wire tensors (edge order),
        scales/zero_points: [n] per-edge quantization params,
        image_sizes: [n*batch_per_shard, 2].  Inputs are device_put with
        the embedded data-axis sharding before the call.
        """
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        if mesh.size != self.n_devices:
            raise ValueError(
                f"artifact was exported for {self.n_devices} devices; "
                f"got a mesh of {mesh.size}")
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        args = [jax.device_put(jnp.asarray(a), data)
                for a in (q, scales, zero_points,
                          jnp.asarray(image_sizes, jnp.int32))]
        return self._tail.call(*args)


def load_exported(blob: bytes):
    """Load either a single-bucket (v1) or bucket-set (v2) artifact."""
    payload = pickle.loads(blob)
    if payload.get("format") == FORMAT_SET:
        return ExportedSplitSet(payload)
    if payload.get("format") == FORMAT_SHARDED:
        return ExportedShardedTail(payload)
    return ExportedSplit(payload)


def main():
    """CLI: serialize a trained bottleneck model's split pair.

    python -m hnd_ghnd_tpu.split.export --config config/ghnd/... \
        --out artifact.hgsplit [--bucket 832,1344] [--batch 1] [--bits 8]
    """
    import argparse
    from hnd_ghnd_tpu.core.config import load_config, overwrite_config
    from hnd_ghnd_tpu.models.factory import get_model
    from hnd_ghnd_tpu.utils import ckpt as ckpt_util

    p = argparse.ArgumentParser(description="AOT split export")
    p.add_argument("--config", required=True)
    p.add_argument("--json", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--bucket", default="832,1344",
                   help="H,W — or a set 'H1,W1;H2,W2' to bundle one "
                        "program per bucket")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    config = overwrite_config(load_config(args.config), args.json)
    model_cfg = config.get("student_model", config.get("model"))
    model, params, state = get_model(model_cfg, seed=args.seed)
    if ckpt_util.check_if_exists(model_cfg.get("ckpt")):
        payload = ckpt_util.load_ckpt(model_cfg["ckpt"])
        params = payload["params"]
        state = payload["state"] or state
        print(f"loaded trained weights from {model_cfg['ckpt']}")
    buckets = [tuple(int(v) for v in part.split(","))
               for part in args.bucket.split(";") if part]
    bits = args.bits if args.bits > 0 else None
    if len(buckets) == 1:
        blob = export_split(model, params, state, buckets[0], args.batch,
                            bits)
    else:
        blob = export_split_set(model, params, state, buckets, args.batch,
                                bits)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob) / 1e6:.1f} MB split artifact to {args.out} "
          f"(buckets {buckets}, batch {args.batch}, {args.bits}-bit wire)")


if __name__ == "__main__":
    main()
