from hnd_ghnd_tpu.parallel.mesh import (
    make_mesh, shard_batch_spec, replicate_spec, make_distill_train_step,
    make_detection_train_step, build_optimizer, stack_microbatches,
)

__all__ = [
    "make_mesh", "shard_batch_spec", "replicate_spec",
    "make_distill_train_step", "make_detection_train_step", "build_optimizer",
    "stack_microbatches",
]
