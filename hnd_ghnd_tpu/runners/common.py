"""Shared runner machinery: per-bucket jit cache, the COCO eval loop,
argparser plumbing common to all entry points.

Parity surface: src/utils/main_util.py evaluate (:75-113) — one pass over
the val/test loader, streaming CocoEvaluator updates, model/evaluator
timing — and the shared --config/--json/--device CLI surface
(src/mimic_runner.py:17-29 etc.).  Distributed flags (--world_size,
--dist_url) map onto the mesh size rather than process-group init.
"""
from __future__ import annotations

import argparse
import os
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np

from hnd_ghnd_tpu.data.loader import DetectionLoader
from hnd_ghnd_tpu.evals.coco_eval import CocoEvaluator
from hnd_ghnd_tpu.evals.postprocess import finalize_predictions
from hnd_ghnd_tpu.models.factory import get_iou_types
from hnd_ghnd_tpu.utils.logging import MetricLogger


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", required=True, help="yaml config path")
    parser.add_argument("--json", default=None,
                        help="JSON string merged over the config")
    parser.add_argument("--device", default=None,
                        help="ignored (jax selects the backend); kept for "
                             "reference CLI compatibility")
    parser.add_argument("--world_size", type=int, default=None,
                        help="number of mesh devices (default: all)")
    parser.add_argument("--dist_url", default=None,
                        help="ignored (no process-group rendezvous in "
                             "single-controller JAX); reference CLI compat")
    parser.add_argument("--seed", type=int, default=0)
    # multi-process SPMD (the reference's RANK/WORLD_SIZE env-driven DDP
    # init, src/utils/main_util.py:43-62); env fallbacks:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    parser.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 for jax.distributed")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


class StepMetrics:
    """Delayed-fetch training metrics for the runner hot loops.

    The reference reads every loss scalar synchronously each iteration
    (MetricLogger feed, src/utils/misc_util.py:177-229) — on TPU a blocking
    D2H round trip per step (~26 ms on a tunneled backend) that defeats
    async dispatch and made the shipped runners measurably slower than
    bench.py's chained-dispatch loop.  Here each step's scalars start an
    async device->host copy at dispatch time and are *read* ``lag`` steps
    later, when the transfer has already landed:

      * the hot loop never blocks on the step it just dispatched;
      * reading the lag-old value bounds dispatch run-ahead to ``lag``
        batches (device memory for in-flight input buffers stays bounded);
      * the NaN abort (reference coco_runner.py:51-54) still fires within
        ``lag`` steps of the bad update.
    """

    def __init__(self, lag: int = 4):
        self.lag = max(int(lag), 1)
        self._pending: deque = deque()

    @staticmethod
    def _start_copy(x) -> None:
        copy = getattr(x, "copy_to_host_async", None)
        if copy is not None:
            try:
                copy()
            except RuntimeError:
                pass  # backend without async copy: device_get still works

    def push(self, step_index: int, loss, loss_dict):
        """Record one dispatch's device scalars.  ``loss`` (and each
        ``loss_dict`` leaf) may be a stacked ``[N]`` vector when the step
        ran N microsteps in one dispatch (``tpu.steps_per_dispatch``);
        ``step_index`` is then the LAST microstep's index.  Returns the list
        of per-step ``(step_index, loss, {term: value})`` float tuples that
        fell out of the lag window (empty while the window is filling)."""
        self._start_copy(loss)
        for v in loss_dict.values():
            self._start_copy(v)
        self._pending.append((step_index, loss, dict(loss_dict)))
        out = []
        while len(self._pending) > self.lag:
            out.extend(self._read_one())
        return out

    def _read_one(self):
        # one device_get over the whole entry: copies are issued for every
        # leaf before blocking, so all scalars cost one round trip (already
        # paid at push time when the backend supports async copies)
        idx, loss, d = self._pending.popleft()
        loss, d = jax.device_get((loss, d))
        loss = np.atleast_1d(np.asarray(loss, np.float64))
        terms = {k: np.atleast_1d(np.asarray(v, np.float64))
                 for k, v in d.items()}
        n = loss.shape[0]
        return [(idx - (n - 1) + j, float(loss[j]),
                 {k: float(v[j]) for k, v in terms.items()})
                for j in range(n)]

    def drain(self):
        """Read every remaining entry (epoch end)."""
        out = []
        while self._pending:
            out.extend(self._read_one())
        return out


class MicrobatchBuffer:
    """Per-bucket buffering for ``tpu.steps_per_dispatch`` stacking.

    Loader batches are padded to one of several static aspect-ratio buckets
    (data/transforms.DEFAULT_BUCKETS), and consecutive batches can come
    from DIFFERENT buckets — their image shapes differ, so they can never
    be stacked into one ``[N, B, ...]`` dispatch.  Triples are therefore
    buffered per full ``images`` shape (targets pad to a static MAX_GT, so
    the image shape is the only varying axis); a bucket dispatches when ITS
    buffer reaches ``spd``.  ``drain()`` yields every leftover triple at
    epoch end for plain single-step dispatch."""

    def __init__(self, spd: int):
        self.spd = spd
        self._bufs: Dict[Any, list] = {}

    def add(self, batch, targets, key):
        """Buffer one loader step.  Returns the stacked
        ``(batch, targets_or_None, keys)`` payload when this batch's bucket
        fills, else None."""
        import jax.numpy as jnp
        from hnd_ghnd_tpu.parallel.mesh import stack_microbatches
        shape = tuple(batch["images"].shape)
        buf = self._bufs.setdefault(shape, [])
        buf.append((batch, targets, key))
        if len(buf) < self.spd:
            return None
        self._bufs[shape] = []
        sb = stack_microbatches([m[0] for m in buf])
        st = (stack_microbatches([m[1] for m in buf])
              if buf[0][1] is not None else None)
        keys = jnp.stack([m[2] for m in buf])
        return sb, st, keys

    def drain(self):
        for buf in self._bufs.values():
            yield from buf
        self._bufs = {}


class JitCache:
    """One compiled forward per (bucket shape, flag tuple)."""

    def __init__(self, model):
        self.model = model
        self._cache: Dict[Any, Any] = {}

    def eval_forward(self, shape, use_bottleneck_transformer: bool,
                     mesh=None):
        """``mesh``: shard the forward over the mesh's data axis via
        shard_map (manual SPMD).  GSPMD auto-partitioning cannot partition
        a pallas_call, so the sharded program must be per-device manual —
        the eval forward is batch-parallel with no cross-image collectives,
        which is exactly shard_map's contract."""
        mesh_key = None if mesh is None else tuple(
            d.id for d in mesh.devices.flat)
        key = ("eval", shape, use_bottleneck_transformer, mesh_key)
        if key not in self._cache:
            model = self.model

            def fwd(params, state, batch):
                if batch["images"].dtype == jax.numpy.uint8:
                    from hnd_ghnd_tpu.parallel.mesh import images_to_compute
                    batch = dict(batch, images=images_to_compute(
                        batch["images"], jax.numpy.float32))
                dets, _, _ = model.forward(
                    params, state, batch, training=False,
                    use_bottleneck_transformer=use_bottleneck_transformer)
                return dets

            if mesh is not None and mesh.devices.size > 1:
                from jax.sharding import PartitionSpec as P
                # check_vma off: the varying-manual-axes tracker rejects
                # lax.while_loop carries whose init is a replicated constant
                # (NMS's suppression fixpoint) even though the program has
                # no collectives at all
                fwd = jax.shard_map(
                    fwd, mesh=mesh,
                    in_specs=(P(), P(), P(mesh.axis_names[0])),
                    out_specs=P(mesh.axis_names[0]),
                    check_vma=False)
            self._cache[key] = jax.jit(fwd)
        return self._cache[key]


def enable_persistent_compilation_cache(path: Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    Every runner calls this at startup so the 60-80 s eval-forward /
    multi-minute train-step TPU compiles are paid once per (program, shape)
    across *runs*, not per process (the dryrun subprocess already did this
    via JAX_COMPILATION_CACHE_DIR; the runners did not).  Honors existing
    JAX_COMPILATION_CACHE_DIR / JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS;
    defaults to ~/.cache/hnd_ghnd_tpu/jax_cache."""
    import os
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hnd_ghnd_tpu",
                     "jax_cache"))
    min_secs = float(os.environ.get(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 2))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception as exc:  # backend without executable serialization
        print(f"persistent compilation cache unavailable: {exc}")


def evaluate(model, params, state, loader: DetectionLoader,
             use_bottleneck_transformer: bool = False,
             log_freq: int = 100, mesh=None,
             jits: Optional[JitCache] = None) -> CocoEvaluator:
    """COCO evaluation pass. Returns the summarized CocoEvaluator.

    With ``mesh`` (and an eval batch size divisible by its device count) the
    batch is sharded over the mesh's data axis and params are replicated, so
    per-epoch val no longer serializes onto one chip — the eval analog of
    the sharded train step (the reference instead evaluates on a single
    device per process, main_util.py:75-113).

    ``jits``: pass a runner-scope JitCache to reuse compiled eval programs
    across epochs (otherwise each call recompiles every bucket shape).

    Timing semantics: the loop is a lag-1 pipeline, so ``model_time`` is
    the dispatch cost of a batch and ``evaluator_time`` is the host-side
    accumulation of the PREVIOUS batch (overlapped with device compute);
    wall-clock throughput is the meaningful total."""
    evaluator = CocoEvaluator(loader.dataset, get_iou_types(model))
    if jits is None:
        jits = JitCache(model)
    assert jits.model is model, "JitCache belongs to a different model"
    logger = MetricLogger()
    shard = mesh is not None and mesh.devices.size > 1
    if shard:
        from hnd_ghnd_tpu.parallel.mesh import put_batch, replicate
        params = replicate(params, mesh)
        state = replicate(state, mesh)

    # Mask pasting / keypoint heatmap decode are per-image independent cv2
    # work that releases the GIL — parallelize across the batch so the
    # worst-case payload (100 valid dets/image: measured 94 ms/batch mask,
    # 561 ms/batch keypoint at batch 8, BASELINE.md round-4) stays hidden
    # behind the device step on multi-core hosts.  HND_TPU_POSTPROC_THREADS
    # overrides; 0/1 disables (single-core containers gain nothing).
    heavy_postproc = ("segm" in evaluator.iou_types
                      or "keypoints" in evaluator.iou_types)
    n_threads = int(os.environ.get("HND_TPU_POSTPROC_THREADS",
                                   os.cpu_count() or 1))
    pool = (ThreadPoolExecutor(n_threads)
            if heavy_postproc and n_threads > 1 else None)

    def accumulate_batch(dets_dev, host_targets, image_sizes):
        dets = jax.device_get(dets_dev)
        dets = {k: np.asarray(v) for k, v in dets.items()}
        live = [(i, tgt) for i, tgt in enumerate(host_targets)
                if not tgt.get("is_padding")]

        def one(i, tgt):
            return tgt["image_id"], finalize_predictions(
                dets, i, tuple(tgt["original_size"]),
                (int(image_sizes[i][0]), int(image_sizes[i][1])))

        if pool is not None:
            preds = dict(pool.map(lambda a: one(*a), live))
        else:
            preds = dict(one(i, tgt) for i, tgt in live)
        evaluator.update(preds)

    # lag-1 pipeline: batch k's detections start an async device->host copy
    # at dispatch time and are accumulated while batch k+1 runs on device —
    # the loop never blocks on the batch it just dispatched (the reference
    # serializes model fwd and evaluator per image, main_util.py:91-102)
    pending = None
    for batch, _, host_targets in logger.log_every(loader, log_freq, "Eval:"):
        shape = batch["images"].shape
        batch_sharded = shard and shape[0] % mesh.devices.size == 0
        fwd = jits.eval_forward(shape, use_bottleneck_transformer,
                                mesh if batch_sharded else None)
        t0 = time.time()
        arrs = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        if batch_sharded:
            arrs = put_batch(arrs, mesh)
        dets_dev = fwd(params, state, arrs)
        for leaf in jax.tree_util.tree_leaves(dets_dev):
            StepMetrics._start_copy(leaf)
        model_time = time.time() - t0
        t0 = time.time()
        if pending is not None:
            accumulate_batch(*pending)
        pending = (dets_dev, host_targets, np.asarray(batch["image_sizes"]))
        logger.update(model_time=model_time,
                      evaluator_time=time.time() - t0)
    if pending is not None:
        accumulate_batch(*pending)
    if pool is not None:
        pool.shutdown(wait=False)
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    evaluator.summarize()
    return evaluator


def eval_mesh_for(loader: DetectionLoader, train_mesh):
    """Data mesh for sharded eval: the largest subset of this process's OWN
    devices from the training mesh that divides the eval batch size.

    Eval must stay process-local: each process iterates its own shard of
    the eval set (batch counts differ across processes), so a cross-process
    SPMD program would deadlock — the merge happens on host afterwards
    (CocoEvaluator.synchronize_between_processes).  Returns None (plain
    single-device eval, the reference's behavior) when the eval batch is 1
    or only one local device is available."""
    if loader.batch_size <= 1 or train_mesh is None:
        return None
    from hnd_ghnd_tpu.parallel.mesh import make_mesh_for_batch
    local = [d for d in train_mesh.devices.flat
             if d.process_index == jax.process_index()]
    if not local:
        return None
    mesh = make_mesh_for_batch(loader.batch_size, local)
    return mesh if mesh.devices.size > 1 else None


def loaders_from_config(config: Dict[str, Any], model_kind: str,
                        batch_size: int, min_sizes=(800,),
                        shard_index: Optional[int] = None,
                        num_shards: Optional[int] = None):
    """Build loaders; in a multi-process run each process loads only its
    shard (shard identity defaults to jax.process_index()/process_count(),
    the DistributedSampler analog — reference src/utils/data_util.py:27-30)
    and eval shards too (merged by
    CocoEvaluator.synchronize_between_processes)."""
    from hnd_ghnd_tpu.data.loader import get_coco_data_loaders
    from hnd_ghnd_tpu.data.transforms import DEFAULT_BUCKETS
    if shard_index is None:
        shard_index = jax.process_index()
    if num_shards is None:
        num_shards = jax.process_count()
    tpu_cfg = config.get("tpu", {}) or {}
    buckets = tuple(tuple(b) for b in tpu_cfg.get("buckets", DEFAULT_BUCKETS))
    min_sizes = tuple(tpu_cfg.get("min_sizes", min_sizes))
    max_size = int(tpu_cfg.get("max_size", 1333))
    eval_bs = int((config.get("test", {}) or {}).get("batch_size", 1))
    # per-epoch val batch size (tpu.eval_batch_size): the final-test
    # batch-1 protocol is reference parity (src/utils/data_util.py:44-47)
    # but per-epoch val has no such constraint — shipped configs set 8 so
    # val rides the batched (and, multi-process, sharded) evaluate() path
    val_bs = tpu_cfg.get("eval_batch_size")
    return get_coco_data_loaders(
        config["dataset"], batch_size,
        with_masks=model_kind == "mask_rcnn",
        with_keypoints=model_kind == "keypoint_rcnn",
        min_sizes=min_sizes, buckets=buckets, max_size=max_size,
        shard_index=shard_index, num_shards=num_shards,
        eval_batch_size=eval_bs,
        val_batch_size=int(val_bs) if val_bs is not None else None,
        shard_eval=num_shards > 1,
        pixel_dtype=str(tpu_cfg.get("pixel_dtype", "float32")))


def compute_dtype_from_config(config) -> "jax.numpy.dtype":
    """tpu.compute_dtype config knob: bfloat16 (default, throughput) or
    float32 (distillation converges faster per step; see BASELINE.md)."""
    import jax.numpy as jnp
    name = (config.get("tpu", {}) or {}).get("compute_dtype", "bfloat16")
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def keypoint_min_sizes(model_kind: str, training: bool):
    """KeypointRCNN trains at random min sides 640..800
    (reference src/models/org/rcnn.py:325-326)."""
    if model_kind == "keypoint_rcnn" and training:
        return (640, 672, 704, 736, 768, 800)
    return (800,)
