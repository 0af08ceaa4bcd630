"""hnd_ghnd_tpu: TPU-native split-computing object-detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`yoshitomo-matsubara/hnd-ghnd-object-detectors` (Head Network Distillation and
Generalized HND for Faster/Mask/Keypoint R-CNN with an injected compressive
bottleneck, split edge/server deployment, and a neural "ext" filter).

Design principles (TPU-first, not a port):
  * All on-device compute is functional JAX under ``jit``/``pjit`` with static
    shapes (aspect-ratio buckets replace dynamic per-image resize).
  * Detector primitives (NMS, multi-scale RoIAlign, anchors) are fixed-shape
    XLA/Pallas formulations, not CUDA-kernel translations.
  * Models are pure functions over nested-dict parameter pytrees whose keys
    mirror the reference's module paths (``backbone.body.layer1`` ...), so the
    reference's YAML config schema (``ts_modules``, ``frozen_modules``) works
    unchanged.
  * Data parallelism is a ``jax.sharding.Mesh`` + NamedSharding; gradient sync
    is an XLA ``psum`` inside the compiled train step (no DDP/NCCL analog).
"""

__version__ = "0.1.0"
