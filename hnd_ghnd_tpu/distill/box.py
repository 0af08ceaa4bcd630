"""DistillationBox: the HND/GHND teacher->student feature-matching engine.

Parity surface: src/distillation/tool.py:12-61.  The reference registers
forward hooks on the module pairs named by ``criterion.terms[*].ts_modules``
and stashes outputs in module __dict__; here models *return* an
intermediates dict keyed by the same dotted paths, so the "hook" is a pure
dictionary lookup — the functional JAX equivalent.

The reference's KeypointRCNN ``fixed_sizes`` alignment (tool.py:45-48) is
inherently satisfied: teacher and student consume the identical host-resized,
padded batch.

TPU-first efficiency: the step computes the trunk only up to the deepest
stage any loss term references (HND: layer1 only — the reference wastefully
runs the full backbone+FPN), runs teacher and student in one jitted program,
and takes gradients only for the trainable (non-frozen) subset.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hnd_ghnd_tpu.distill.losses import get_loss
from hnd_ghnd_tpu.models.rcnn import RCNN

Params = Dict[str, Any]

_LAYER_RE = re.compile(r"backbone\.body\.layer(\d)")


def _max_stage(paths: Sequence[str]) -> int:
    """Deepest trunk stage any ts_module path references (min 1)."""
    best = 1
    needs_fpn = False
    for p in paths:
        m = _LAYER_RE.fullmatch(p)
        if m:
            best = max(best, int(m.group(1)))
        else:
            needs_fpn = True
    return 4 if needs_fpn else best


class DistillationBox:
    """Builds the jittable distillation loss for a (teacher, student) pair."""

    def __init__(self, teacher: RCNN, student: RCNN,
                 criterion_config: Dict[str, Any]):
        self.teacher = teacher
        self.student = student
        self.criterion = get_loss(criterion_config)
        self.pairs = {name: paths for name, (paths, _, _)
                      in self.criterion.terms.items()}
        all_paths = [p for paths in self.pairs.values() for p in paths]
        self.upto = _max_stage(all_paths)
        self.use_org_loss = self.criterion.org_loss_factor != 0

    def _features(self, model: RCNN, params, state, images, *, training):
        body_feats, new_body_state, _ = model.body.apply(
            params["backbone"]["body"], state["backbone"]["body"],
            model.normalize(images), training=training, upto=self.upto)
        inter = {f"backbone.body.layer{i}": body_feats.get(f"layer{i}")
                 for i in range(1, self.upto + 1)}
        if any(p == "backbone.fpn" for paths in self.pairs.values()
               for p in paths):
            fpn_feats = model.fpn.apply(
                params["backbone"]["fpn"],
                [body_feats[f"layer{i}"] for i in (1, 2, 3, 4)])
            inter["backbone.fpn"] = jnp.concatenate(
                [f.reshape(f.shape[0], -1) for f in fpn_feats], axis=1)
        return inter, {"backbone": {"body": new_body_state}}

    def loss(self, t_params: Params, t_state: Params,
             s_params: Params, s_state: Params,
             batch: Dict[str, jnp.ndarray],
             targets: Optional[Dict[str, jnp.ndarray]] = None,
             rng: Optional[jax.Array] = None):
        """Compute the distillation loss.

        Returns (total_loss, (term_loss_dict, new_student_state)).
        Teacher runs in eval mode under stop_gradient; student runs in train
        mode (bottleneck BN uses batch stats; transformer disabled — the
        reference toggles exactly this around each epoch,
        src/mimic_runner.py:86-90).
        """
        images = batch["images"]
        t_inter, _ = self._features(self.teacher, t_params, t_state, images,
                                    training=False)
        t_inter = jax.lax.stop_gradient(t_inter)
        s_inter, new_s_state = self._features(self.student, s_params, s_state,
                                              images, training=True)

        output_dict = {}
        for name, (t_path, s_path) in self.pairs.items():
            output_dict[name] = (t_inter[t_path], s_inter[s_path])

        org_loss_dict = None
        if self.use_org_loss:
            assert targets is not None and rng is not None, \
                "org_loss_factor != 0 requires targets and rng"
            org_loss_dict, _, _ = self.student.forward(
                s_params, s_state, batch, training=True, targets=targets,
                rng=rng)

        total, loss_dict = self.criterion(output_dict, org_loss_dict)
        if org_loss_dict:
            # surface the task-loss terms in the logged dict (the criterion
            # only folds them into the scalar, loss.py:31-34 analog)
            loss_dict = dict(loss_dict,
                             **{f"org_{k}": v for k, v in org_loss_dict.items()})
        return total, (loss_dict, new_s_state)
